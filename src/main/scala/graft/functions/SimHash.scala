package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 64-bit SimHash kernel over a token array. Shared by
  * interpreted eval and generated code (the codegen emits a call to this
  * static method — the StaticInvoke pattern used by Spark's own
  * collection expressions).
  *
  * Per-token hash = XXH64(utf8 bytes, seed 42) — identical to the builtin
  * `xxhash64(token)`, so results match the compositional
  * explode + 64×`sum()` formulation bit-for-bit while touching each row
  * exactly once with zero shuffle.
  */
object SimHashImpl {
  final val Seed = 42L

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes(), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `simhash64(tokens ARRAY<STRING>) -> LONG` as a native Catalyst
  * expression with code generation: the whole document signature is one
  * tight loop inside the scan's WholeStageCodegen span. The alternative
  * compositional plan (explode → 64 partial sums → groupBy) shuffles every
  * token; this touches nothing but the row. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(tokens: Any): Any =
    SimHashImpl.compute(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Registration: either inject via `SparkSessionExtensions`
  * (`.withExtensions(new GraftExtensions)` / the
  * `spark.sql.extensions=graft.functions.GraftExtensions` conf), or call
  * [[GraftFunctions.register]] on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.simhash64Descriptor)
    e.injectFunction(GraftFunctions.minhashDescriptor)
    e.injectFunction(GraftFunctions.wordShinglesDescriptor)
    e.injectFunction(GraftFunctions.pairCombinationsDescriptor)
    VectorFunctions.descriptors.foreach(e.injectFunction)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private[graft] val simhash64Descriptor = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (children: Seq[Expression]) => SimHash64(children.head))

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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    MinHashFunctions.register(spark)
    WordShingleFunctions.register(spark)
    VectorFunctions.register(spark)
    PairFunctions.register(spark)
  }

  /** Column-API entry point (requires [[register]] on the session). */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
}
