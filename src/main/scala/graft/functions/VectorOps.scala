package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Single-pass vector kernels for the similarity operators.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
  * are NOT code-generated — they evaluate interpreted, boxing every
  * element and re-entering the lambda per element. For 64-dim embedding
  * arithmetic that interpretation dominates the query time. These
  * expressions compute the same results (bit-for-bit — proven by tests
  * against the compositional formulations in
  * [[graft.operators.Similarity]]) inside whole-stage codegen with one
  * tight Java loop per row.
  */
object VectorOpsImpl {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Quantize a float/double vector to scale-6 unscaled longs — exactly
    * `CAST(x AS DECIMAL(p,6))` per element (`BigDecimal.valueOf` =
    * shortest-decimal `Double.toString`, then HALF_UP), the same
    * conversion Spark's cast and the DuckDB oracle apply. This is the ONE
    * place the expensive decimal conversion happens: once per row, before
    * any join, so the per-pair dot product below is pure long arithmetic.
    * Null element → null result (decimal-cast null propagation). */
  def quantize6(a: ArrayData, aF: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = java.math.BigDecimal.valueOf(elem(a, i, aF))
        .movePointRight(6).setScale(0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact dot product over two scale-6 quantized vectors: the sum of
    * long products is the scale-12 unscaled value — exact, associative,
    * order-independent, and identical to summing
    * `CAST(a6*b6 AS DECIMAL(25,12))` in any engine. Surfaced as double.
    * Pure integer multiply-adds per pair; `Math.multiplyExact` guards the
    * (unreachable for unit-scale embeddings) overflow at |x| ≳ 600. */
  def dotQ12(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      sum = Math.addExact(sum,
        Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Double.valueOf(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 12)
        .doubleValue())
  }

  /** Exact L2 norm of a scale-6 quantized vector (same path as
    * [[dotQ12]] against itself, then sqrt in double). */
  def normQ12(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      sum = Math.addExact(sum, Math.multiplyExact(x, x))
      i += 1
    }
    java.lang.Double.valueOf(Math.sqrt(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 12)
        .doubleValue()))
  }

  /** Hamming distance between two packed bit signatures (arrays of
    * 64-bit words): popcount of the per-word XOR, summed. The per-pair
    * kernel of the binary-quantization ANN — one xor + one POPCNT per
    * word, so a 64-dim signature costs a single instruction pair where
    * the exact dot costs 64 multiply-adds. */
  def hammingWords(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** Deterministic ±1 for hyperplane component (table, plane, dim) — a
    * splitmix64 bit. Any executor anywhere reproduces the same planes
    * with zero shipped state. */
  def planeSignLong(table: Int, plane: Int, dim: Int): Long = {
    var z = (table.toLong << 40) + (plane.toLong << 20) + dim.toLong +
      0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    if ((z & 1L) == 1L) 1L else -1L
  }

  def planeSign(table: Int, plane: Int, dim: Int): Double =
    planeSignLong(table, plane, dim).toDouble

  /** All `tables` random-hyperplane signatures of one QUANTIZED vector
    * ([[quantize6]] output) in a single pass: packed `planes`-bit bucket
    * ids, LSB-first. Operating on the scale-6 longs makes the signature
    * pure integer arithmetic — order-independent and bit-identical in any
    * engine, which is what lets the DuckDB oracle reproduce LSH buckets.
    * Null elements → all-zero signatures, matching the compositional
    * `when(acc > 0, 1).otherwise(0)` under null. */
  def rhpSignatures(v: ArrayData, planes: Int, tables: Int): ArrayData = {
    val dims = v.numElements()
    var hasNull = false
    var d = 0
    while (d < dims && !hasNull) { hasNull = v.isNullAt(d); d += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var packed = 0L
      var p = 0
      while (p < planes) {
        if (!hasNull) {
          var acc = 0L
          var i = 0
          while (i < dims) {
            acc += (if (planeSignLong(t, p, i) > 0) v.getLong(i)
                    else -v.getLong(i))
            i += 1
          }
          if (acc > 0) packed |= (1L << p)
        }
        p += 1
      }
      out(t) = packed
      t += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait VectorElementTypes { self: Expression =>
  protected def arrayFlag(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def checkNumericArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
    }
}

/** `quantize6(vec) -> ARRAY<LONG>`: scale-6 decimal quantization, the
  * once-per-row half of the exact dot product. */
case class Quantize6(child: Expression) extends UnaryExpression with VectorElementTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkNumericArray(child, prettyName)
  override def nullSafeEval(a: Any): Any =
    VectorOpsImpl.quantize6(a.asInstanceOf[ArrayData], arrayFlag(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData r =
         |  graft.functions.VectorOpsImpl.quantize6($a, ${arrayFlag(child)});
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "quantize6"
}

private[functions] trait LongArrayCheck { self: Expression =>
  protected def checkLongArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires ARRAY<LONG> (quantize6 output), got ${other.sql}")
    }
}

/** `dot_q12(qa, qb) -> DOUBLE`: exact scale-12 dot product of two
  * quantized vectors — pure long arithmetic per pair. */
case class DotQ12(left: Expression, right: Expression)
    extends BinaryExpression with LongArrayCheck {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkLongArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkLongArray(right, prettyName)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.dotQ12(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.functions.VectorOpsImpl.dotQ12($a, $b);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_q12"
}

/** `hamming_words(a ARRAY<LONG>, b ARRAY<LONG>) -> LONG`: Hamming
  * distance between packed bit signatures. */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression with LongArrayCheck {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkLongArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkLongArray(right, prettyName)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsImpl.hammingWords(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Long r = graft.functions.VectorOpsImpl.hammingWords($a, $b);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = r.longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "hamming_words"
}

/** `norm_q12(qa) -> DOUBLE`: exact L2 norm of a quantized vector. */
case class NormQ12(child: Expression)
    extends UnaryExpression with LongArrayCheck {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(child, prettyName)
  override def nullSafeEval(a: Any): Any =
    VectorOpsImpl.normQ12(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOpsImpl.normQ12($a).doubleValue()")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "norm_q12"
}

/** `rhp_signatures(qvec ARRAY<LONG>, planes, tables) -> ARRAY<LONG>`:
  * every LSH table's packed random-hyperplane bucket id in one codegen'd
  * pass over the quantized vector (the compositional form re-reads the
  * vector `planes × tables` times through interpreted folds). */
case class RhpSignatures(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with LongArrayCheck {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    val v = checkLongArray(first, prettyName)
    if (v != TypeCheckResult.TypeCheckSuccess) v
    else if (second.dataType == IntegerType && second.foldable &&
             third.dataType == IntegerType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<LONG>, foldable INT, foldable INT)")
  }
  override def nullSafeEval(v: Any, planes: Any, tables: Any): Any =
    VectorOpsImpl.rhpSignatures(v.asInstanceOf[ArrayData],
      planes.asInstanceOf[Int], tables.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p, t) =>
      s"graft.functions.VectorOpsImpl.rhpSignatures($v, $p, $t)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "rhp_signatures"
}

object VectorFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val descriptors = Seq(
    (FunctionIdentifier("quantize6"),
      new ExpressionInfo(classOf[Quantize6].getName, "quantize6"),
      (es: Seq[Expression]) => Quantize6(es(0))),
    (FunctionIdentifier("dot_q12"),
      new ExpressionInfo(classOf[DotQ12].getName, "dot_q12"),
      (es: Seq[Expression]) => DotQ12(es(0), es(1))),
    (FunctionIdentifier("norm_q12"),
      new ExpressionInfo(classOf[NormQ12].getName, "norm_q12"),
      (es: Seq[Expression]) => NormQ12(es(0))),
    (FunctionIdentifier("rhp_signatures"),
      new ExpressionInfo(classOf[RhpSignatures].getName, "rhp_signatures"),
      (es: Seq[Expression]) => RhpSignatures(es(0), es(1), es(2))),
    (FunctionIdentifier("hamming_words"),
      new ExpressionInfo(classOf[HammingWords].getName, "hamming_words"),
      (es: Seq[Expression]) => HammingWords(es(0), es(1))))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }

  def quantize6(a: Column): Column = call_function("quantize6", a)
  def dotQ12(qa: Column, qb: Column): Column = call_function("dot_q12", qa, qb)
  def normQ12(qa: Column): Column = call_function("norm_q12", qa)
  /** Convenience composition; hot paths quantize once per row pre-join. */
  def dotExact(a: Column, b: Column): Column =
    dotQ12(quantize6(a), quantize6(b))
  def normExact(a: Column): Column = normQ12(quantize6(a))
  def rhpSignatures(vec: Column, planes: Int, tables: Int): Column =
    call_function("rhp_signatures", vec, lit(planes), lit(tables))
  def hammingWords(a: Column, b: Column): Column =
    call_function("hamming_words", a, b)
}
