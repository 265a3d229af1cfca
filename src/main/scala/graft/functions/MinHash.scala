package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Single-pass MinHash signature kernel: k 60-bit min-hashes over a shingle
  * array, computed per row with no explode and no shuffle.
  *
  * Hash family (chosen to be expressible in ANY SQL engine, so the DuckDB
  * correctness oracle can reproduce signatures bit-for-bit):
  *
  *  - `b1 = md5_60(shingle)`, `b2 = md5_60(shingle ++ "#")` — the first
  *    15 hex digits (60 bits) of MD5, the same digest every engine ships.
  *  - `h_i = (b1 + i·b2) mod 2^60` — the Kirsch–Mitzenmacher double-hash
  *    family, computed with a 54/6-bit split so no intermediate exceeds
  *    63 bits (no wrapping arithmetic → ANSI-safe in Spark SQL, overflow-
  *    free in DuckDB):
  *    `h_i = (b1 + (i·lo54 & M60) + ((i·hi6 & 63) << 54)) & M60`.
  *
  * The compositional Spark-SQL formulation
  * (`Dedup.minhashSignaturesViaAggregation`) and the DuckDB oracle both
  * evaluate this formula literally; tests prove all three identical.
  */
object MinHashImpl {
  final val M60 = (1L << 60) - 1
  final val Lo54 = (1L << 54) - 1

  /** First 60 bits of MD5 (== parsing the first 15 hex digits). */
  def md5_60(bytes: Array[Byte], md: java.security.MessageDigest): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def kmHash(b1: Long, b2: Long, i: Int): Long = {
    val lo = b2 & Lo54
    val hi = b2 >>> 54
    (b1 + ((i * lo) & M60) + (((i * hi) & 63L) << 54)) & M60
  }

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i).getBytes
        val b1 = md5_60(s, md)
        val b2 = md5_60(s :+ '#'.toByte, md)
        var j = 0
        while (j < k) {
          val h = kmHash(b1, b2, j)
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

object SigAgreementImpl {
  /** Count of positions where two equal-length signatures agree.
    * Signatures of different lengths are malformed input (every
    * generator emits fixed-k arrays) — fail loudly rather than silently
    * scoring the missing tail as disagreement. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"sig_agreement: signature lengths differ ($n vs ${b.numElements()})")
    var c = 0L
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** `sig_agreement(a ARRAY<LONG>, b ARRAY<LONG>) -> LONG`: positions where
  * two signatures agree — the per-pair MinHash similarity estimator. The
  * compositional `zip_with` + `filter` + `size` form interprets (and
  * boxes) per element; this is one codegen'd long loop, in line with the
  * kernel discipline for hot per-pair array math. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sig_agreement requires (ARRAY<LONG>, ARRAY<LONG>)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreementImpl.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SigAgreementImpl.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sig_agreement"
}

object Md5_60ArrayImpl {
  def compute(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"md5_60_array: null element at position $i (input arrays " +
            "must be null-free; shingle kernels emit containsNull=false)")
      out(i) = MinHashImpl.md5_60(arr.getUTF8String(i).getBytes, md)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `md5_60_array(a ARRAY<STRING>) -> ARRAY<LONG>`: md5_60 of every
  * element in one loop (one MessageDigest per row, reused across
  * elements) — the kernel form of `transform(a, s -> md5_60(s))`, which
  * interprets the md5 expression per element. Elements must be
  * non-null (shingle arrays are). */
case class Md5_60Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_60_array requires ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(arr: Any): Any =
    Md5_60ArrayImpl.compute(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.Md5_60ArrayImpl.compute($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "md5_60_array"
}

object MinHashFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSignature(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sig_agreement",
      exprs => SigAgreement(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_60_array",
      exprs => Md5_60Array(exprs.head), "scala_udf")
  }

  def minhashSignature(shingles: Column, k: Int): Column =
    call_function("minhash_signature", shingles, lit(k))

  def sigAgreement(a: Column, b: Column): Column =
    call_function("sig_agreement", a, b)

  def md5_60Array(a: Column): Column =
    call_function("md5_60_array", a)
}
