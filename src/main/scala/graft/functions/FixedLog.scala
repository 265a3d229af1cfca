package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Exact fixed-point logarithm for cross-engine-deterministic scoring.
  *
  * `ln`/`log2` doubles are transcendental — the JVM and every SQL engine
  * may legally round the last ulp differently, so any score built on them
  * cannot be hash-compared across engines (the same reason
  * [[graft.operators.TextAnalysis.bm25Rational]] rationalizes BM25's idf).
  * This kernel quantizes log2 to QUARTER BITS over an integer rational,
  * using only integer arithmetic both engines define identically:
  *
  *   floor(4·log2(b/a)) = bitlength( floor(b⁴/a⁴) ) − 1      (b ≥ a ≥ 1)
  *
  * (floor(log2(floor(y))) = floor(log2(y)) for y ≥ 1: flooring cannot
  * cross a power of two downward.) DuckDB states the same value as
  * `length(bin((b::HUGEINT*b*b*b) // (a::HUGEINT*a*a*a))) - 1`, exact up
  * to b ≤ ~1.1·10⁹ (b⁴ within HUGEINT); this side is BigInteger-backed,
  * so it stays exact at any corpus scale.
  */
object FixedLogImpl {

  /** floor(4·log2(b/a)); null outside the domain 1 ≤ a ≤ b. */
  def log2QuarterBits(a: Long, b: Long): java.lang.Long = {
    if (a < 1L || b < a) return null
    // b⁴ < 2⁶³ → pure long arithmetic (b ≤ 55108 = floor(2^(63/4)))
    if (b <= 55108L) {
      val v = (b * b * b * b) / (a * a * a * a)
      java.lang.Long.valueOf(63 - java.lang.Long.numberOfLeadingZeros(v))
    } else {
      val v = java.math.BigInteger.valueOf(b).pow(4)
        .divide(java.math.BigInteger.valueOf(a).pow(4))
      java.lang.Long.valueOf((v.bitLength - 1).toLong)
    }
  }
}

/** `log2_quarter_bits(a BIGINT, b BIGINT) -> BIGINT`: floor(4·log2(b/a)),
  * exact; null for a < 1 or b < a. */
case class Log2QuarterBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def nullSafeEval(a: Any, b: Any): Any =
    FixedLogImpl.log2QuarterBits(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Long r = graft.functions.FixedLogImpl.log2QuarterBits($a, $b);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = r.longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "log2_quarter_bits"
}

object FixedLogFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val descriptors = Seq(
    (FunctionIdentifier("log2_quarter_bits"),
      new ExpressionInfo(classOf[Log2QuarterBits].getName, "log2_quarter_bits"),
      (es: Seq[Expression]) => Log2QuarterBits(es(0), es(1))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }

  def log2QuarterBits(a: Column, b: Column): Column =
    call_function("log2_quarter_bits", a, b)
}
