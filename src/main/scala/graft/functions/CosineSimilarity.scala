package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `array<double>`
  * vectors in ONE fused pass (dot product + both norms), with whole-stage
  * codegen via `doGenCode`.
  *
  * Motivation (SURVEY §7.6 north-star extensions): the composed
  * `aggregate`/`zip_with` formulation in [[graft.sim.Similarity]] walks the
  * arrays three times through generic HOF lambdas; this expression emits a
  * single tight loop over the primitive arrays — the preferred extension
  * mechanism per the Spark-first design rules (custom Expression before
  * UDF). Null if either side is null; NaN on zero-norm input (caller
  * filters), matching double semantics of the composed form.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session wiring for graft's native expressions.
  *
  * Use either path:
  *  - `GraftFunctions.register(spark)` — function-registry registration,
  *    then `expr("graft_cosine(a, b)")` / SQL;
  *  - `.withExtensions(new GraftExtensions)` at session build time
  *    (`SparkSessionExtensions.injectFunction`).
  */
object GraftFunctions {
  import org.apache.spark.sql.{Column, SparkSession}

  val cosineDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Session ids already registered — registration is cheap but re-running
    * it per query floods the log with "function replaced" warnings. */
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = {
    if (!registered.add(System.identityHashCode(spark.sessionState.functionRegistry).toString)) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSig(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashSig(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaccard_sorted", exprs => JaccardSorted(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect", exprs => SortedIntersect(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_hashes", exprs => NgramHashes(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_long", exprs => MinHashLong(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp_keys", exprs => SrpKeys(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_eq_positions", exprs => EqPositions(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain", exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKSketch.fromExprs(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_scrub_repeats", exprs => ScrubRepeats(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_entropy", exprs => CharEntropy(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dsir_buckets", exprs => DsirBuckets(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_buckets", exprs => TokenBuckets(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_repetition_stats", exprs => RepetitionStats(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deflate_len", exprs => DeflateLen(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bootstrap_weights",
      exprs => BootstrapWeights(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_buckets",
      exprs => CmsBuckets(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_hashes",
      exprs => WinnowHashes(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  /** Column-API face (usable after [[register]]). */
  def graftCosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
  }

  /** Registry-free Column over the [[GraftTokens]] tokenizer kernel —
    * usable from pure Column-builder helpers that have no SparkSession at
    * hand (the expression is injected directly, no function lookup). */
  def tokens(text: Column, keepAccents: Boolean, dropEmpty: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    import org.apache.spark.sql.catalyst.expressions.Literal
    ColumnShim.column(GraftTokens(ColumnShim.expression(text),
      Literal(keepAccents), Literal(dropEmpty)))
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.cosineDescriptor)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
