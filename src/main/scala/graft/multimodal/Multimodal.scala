package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, mapPartitions
  * signature) is real and tested; the media decode/resize kernels are
  * deterministic byte-level stand-ins because no image/audio codec libraries
  * exist in this environment — swap [[fakeDecode]]/[[fakeResize]] for a real
  * decoder (JNI codec / Arrow-batched python worker) without touching the
  * pipeline shape. Every public API is callable end-to-end.
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

  /** Deterministic byte-level "resize" kernel, consistent with
    * [[fakeDecode]]: the blob is treated as a square raster of side ⌈√n⌉
    * and nearest-neighbor-sampled down to maxEdge × maxEdge bytes; blobs
    * already within budget pass through untouched. A real image decoder
    * slots in here without changing the stage's shape. */
  private[multimodal] def fakeResize(blob: Array[Byte], maxEdge: Int): Array[Byte] = {
    val side = math.ceil(math.sqrt(blob.length.toDouble)).toInt
    if (blob.isEmpty || side <= maxEdge) blob
    else {
      val out = new Array[Byte](maxEdge * maxEdge)
      var y = 0
      while (y < maxEdge) {
        val sy = (y.toLong * side / maxEdge).toInt
        var x = 0
        while (x < maxEdge) {
          val idx = sy * side + (x.toLong * side / maxEdge).toInt
          out(y * maxEdge + x) = if (idx < blob.length) blob(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  private val resizedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("blob", BinaryType),
    StructField("media_type", StringType)))

  /** Resize stage for image assets: same mapPartitions topology as
    * [[extractFeatures]] (per-partition codec init point), nearest-neighbor
    * byte-raster downsample to ≤ maxEdge² bytes, meta recomputed (n_bytes +
    * checksum) — same (asset_id, blob, meta) schema out as [[toAssets]]. */
  def resizeImages(assets: DataFrame, maxEdge: Int): DataFrame = {
    require(maxEdge > 0, s"maxEdge must be positive, got $maxEdge")
    val enc = Encoders.row(resizedSchema)
    assets
      .select(col("asset_id"), col("blob"), col("meta.media_type").as("media_type"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), fakeResize(r.getAs[Array[Byte]](1), maxEdge), r.getString(2))
        }
      }(enc)
      .select(col("asset_id"), col("blob"),
        struct(col("media_type"),
          length(col("blob")).as("n_bytes"),
          md5(col("blob")).as("checksum")).as("meta"))
  }
}
