package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Single-pass 60-bit SimHash kernel over a token array. Shared by
  * interpreted eval and generated code (the codegen emits a call to this
  * static method — the StaticInvoke pattern used by Spark's own
  * collection expressions).
  *
  * Per-token hash = the first 60 bits of MD5 (`MinHashImpl.md5_60`) — a
  * digest every SQL engine ships, so the DuckDB correctness oracle can
  * reproduce the signature bit-for-bit (a native 64-bit hash like
  * xxhash64 would be inexpressible there). 60 bits also keep every
  * packed value positive in a signed 64-bit integer in any engine.
  */
object SimHashImpl {
  final val Bits = 60

  def compute(tokens: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](Bits)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = MinHashImpl.md5_60(tokens.getUTF8String(i).getBytes, md)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash60(tokens ARRAY<STRING>) -> LONG` as a native Catalyst
  * expression with code generation: the whole document signature is one
  * tight loop inside the scan's WholeStageCodegen span. The alternative
  * compositional plan (explode → 64 partial sums → groupBy) shuffles every
  * token; this touches nothing but the row. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 requires ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(tokens: Any): Any =
    SimHashImpl.compute(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
  override def prettyName: String = "simhash60"
}

/** Registration: either inject via `SparkSessionExtensions`
  * (`.withExtensions(new GraftExtensions)` / the
  * `spark.sql.extensions=graft.functions.GraftExtensions` conf), or call
  * [[GraftFunctions.register]] on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.simhash60Descriptor)
    e.injectFunction(GraftFunctions.minhashDescriptor)
    e.injectFunction(GraftFunctions.wordShinglesDescriptor)
    e.injectFunction(GraftFunctions.pairCombinationsDescriptor)
    VectorFunctions.descriptors.foreach(e.injectFunction)
    FixedLogFunctions.descriptors.foreach(e.injectFunction)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private[graft] val simhash60Descriptor = (
    FunctionIdentifier("simhash60"),
    new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
    (children: Seq[Expression]) => SimHash60(children.head))

  private[graft] val minhashDescriptor = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
    (children: Seq[Expression]) => MinHashSignature(children(0), children(1)))

  private[graft] val wordShinglesDescriptor = (
    FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (children: Seq[Expression]) => WordShingles(children(0), children(1)))

  private[graft] val pairCombinationsDescriptor = (
    FunctionIdentifier("pair_combinations"),
    new ExpressionInfo(classOf[PairCombinations].getName, "pair_combinations"),
    (children: Seq[Expression]) => PairCombinations(children.head))

  def register(spark: SparkSession): Unit = {
    // Idempotent per session: every operator entry point calls this, so
    // without the guard each call re-replaces every temp function and the
    // registry logs a "function X replaced" warning per kernel per query
    // (dozens per bench run). All kernels register together, so one
    // sentinel function suffices as the "already done" probe.
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("simhash60"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs.head), "scala_udf")
    MinHashFunctions.register(spark)
    WordShingleFunctions.register(spark)
    VectorFunctions.register(spark)
    PairFunctions.register(spark)
    FixedLogFunctions.register(spark)
  }

  /** Column-API entry point (requires [[register]] on the session). */
  def simhash60(tokens: Column): Column = call_function("simhash60", tokens)
}
