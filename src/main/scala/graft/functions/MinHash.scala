package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Single-pass MinHash signature kernel: k 64-bit min-hashes over a shingle
  * array, computed per row with no explode and no shuffle.
  *
  * Hash family is bit-identical to the compositional builtin formulation
  * `min(xxhash64(xxhash64(shingle), i))`: per shingle
  * `base = XXH64(bytes, 42)`, then
  * `h_i = XXH64.hashInt(i, XXH64.hashLong(base, 42))` — exactly how the
  * `XxHash64` expression folds its children. Proven equal by test.
  */
object MinHashImpl {
  final val Seed = 42L

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), Seed)
        val inner = XXH64.hashLong(base, Seed)
        var j = 0
        while (j < k) {
          val h = XXH64.hashInt(j, inner)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_signature(shingles ARRAY<STRING>, k INT) -> ARRAY<LONG>` as a
  * native codegen'd expression. The compositional plan (explode + k
  * `min()` aggregates) shuffles every shingle; this touches only the row. */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "minhash_signature requires (ARRAY<STRING>, foldable INT)")
    }
  override def nullSafeEval(shingles: Any, k: Any): Any =
    MinHashImpl.compute(shingles.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, k) => s"graft.functions.MinHashImpl.compute($s, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "minhash_signature"
}

object MinHashFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSignature(exprs(0), exprs(1)), "scala_udf")

  def minhashSignature(shingles: Column, k: Int): Column =
    call_function("minhash_signature", shingles, lit(k))
}
