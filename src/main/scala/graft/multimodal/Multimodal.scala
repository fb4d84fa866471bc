package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, mapPartitions
  * signature) is real and tested; the actual media decode is STUBBED with a
  * deterministic byte-level fake because no image/audio codec libraries
  * exist in this environment — swap [[fakeDecode]] for a real decoder (JNI
  * codec / Arrow-batched python worker) without touching the pipeline shape.
  *
  * Scale design: assets are repartitioned by a hash shard key before the
  * decode stage so a 100 TB corpus spreads evenly across executors, and the
  * decode runs once per partition iterator (mapPartitions) so per-batch
  * model/codec init amortizes — the same topology as an Arrow-batched
  * `mapInPandas` decode.
  */
object Multimodal {

  /** Asset metadata carried alongside the blob. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("checksum", StringType)))

  /** Wrap a binary-bearing column as (asset_id, blob, meta) — the canonical
    * multimodal frame. `media_type` is caller-declared (content sniffing
    * would live here). */
  def toAssets(df: DataFrame, idCol: String, blobCol: String,
               mediaType: String): DataFrame =
    df.select(
      col(idCol).as("asset_id"),
      col(blobCol).cast("binary").as("blob"),
      struct(
        lit(mediaType).as("media_type"),
        length(col(blobCol).cast("binary")).as("n_bytes"),
        md5(col(blobCol).cast("binary")).as("checksum")).as("meta"))

  /** Shard for balanced decode: hash-repartition on the asset id so skewed
    * upstream layouts (e.g. per-site crawl files) don't serialize decode. */
  def shardForDecode(assets: DataFrame, partitions: Int): DataFrame =
    assets.repartition(partitions, col("asset_id"))

  /** Deterministic stand-in for a media decoder: derives a fixed-size float
    * "feature vector" from the raw bytes. REPLACE with a real codec —
    * signature and batch shape are the contract. */
  private[multimodal] def fakeDecode(blob: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < blob.length) { h = 31 * h + blob(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(j) = ((h % 1000003L).toFloat / 1000003.0f)
      j += 1
    }
    out
  }

  private val featuresSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false)),
    StructField("n_bytes", IntegerType)))

  /** Decode + feature-extract stage: one decoder instance per partition,
    * rows streamed through it (the mapPartitions ≙ mapInPandas batch
    * topology). Output: (asset_id, features: array<float>, n_bytes). */
  def extractFeatures(assets: DataFrame, dim: Int = 64): DataFrame = {
    val enc = Encoders.row(featuresSchema)
    assets.select(col("asset_id"), col("blob")).mapPartitions { rows =>
      // per-partition init happens HERE (codec/model load in a real impl)
      rows.map { r =>
        val id = r.getLong(0)
        val blob = r.getAs[Array[Byte]](1)
        Row(id, fakeDecode(blob, dim).toSeq, blob.length)
      }
    }(enc)
  }

  /** Frame sampling: k evenly spaced byte-range "frames" per asset —
    * expression-level (posexplode + binary substring), no UDF; stands in
    * for video frame-sampling with identical output shape
    * (asset_id, frame_idx, frame_bytes). */
  def sampleFrames(assets: DataFrame, k: Int = 4, frameLen: Int = 256): DataFrame =
    assets
      .select(col("asset_id"), col("blob"), col("meta.n_bytes").as("n"))
      .select(col("asset_id"), col("blob"), col("n"),
        posexplode(sequence(lit(0), lit(k - 1))).as(Seq("frame_idx", "i")))
      .select(col("asset_id"), col("frame_idx"),
        expr(s"substring(blob, cast(frame_idx * greatest(n - $frameLen, 1) / $k as int) + 1, $frameLen)")
          .as("frame_bytes"))

  /** Resize stage for image assets. Genuinely unimplementable here (no
    * codec libs in the container) — the contract is: same (asset_id, blob,
    * meta) schema out, meta.n_bytes updated. */
  def resizeImages(assets: DataFrame, maxEdge: Int): DataFrame =
    throw new NotImplementedError(
      "image resize requires a codec library; wire a real decoder into the " +
        "extractFeatures/mapPartitions topology")
}
