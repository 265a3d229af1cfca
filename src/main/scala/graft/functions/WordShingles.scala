package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernel: tokenize + slide + distinct in one
  * tight loop, replacing the interpreted
  * `array_distinct(transform(sequence(...), i => concat_ws(slice(...))))`
  * chain of [[graft.operators.TextAnalysis.shingles]] (higher-order
  * functions are not code-generated — per-shingle lambda interpretation
  * dominated the n-gram/minhash queries).
  *
  * Bit-identical to the compositional form (proven by test):
  *  - tokens = `split(trim(text), "\\s+")` — Spark `trim` removes ASCII
  *    spaces only; split keeps empty leading fields for other whitespace
  *  - fewer than `n` tokens → one shingle joining all tokens
  *  - otherwise every n-token window joined by one space, first-occurrence
  *    distinct (like `array_distinct`)
  */
object WordShinglesImpl {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val trimmed = text.trim().toString
    val toks = trimmed.split("\\s+", -1)
    if (toks.length < n)
      new GenericArrayData(Array[Any](
        UTF8String.fromString(toks.mkString(" "))))
    else {
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }
}

/** `word_shingles(text STRING, n INT) -> ARRAY<STRING>` as a native
  * codegen'd expression. */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "word_shingles requires (STRING, foldable INT)")
    }
  override def nullSafeEval(text: Any, n: Any): Any =
    WordShinglesImpl.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.WordShinglesImpl.compute($t, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "word_shingles"
}

/** Character `k`-gram md5_60 hashes in one pass — the gram-hashing half
  * of winnowing fingerprints. Code-point semantics match Spark's
  * `substr`/DuckDB's `substr` exactly; text shorter than `k` hashes as
  * one whole-text gram. The compositional
  * `transform(sequence(...), i => md5_60(substr(...)))` interprets one
  * substring+md5 per element; this is a tight loop per row. */
object WinnowGramsImpl {
  def compute(text: UTF8String, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k)
      new GenericArrayData(Array[Any](MinHashImpl.md5_60(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8), md)))
    else {
      val out = new Array[Long](n - k + 1)
      var i = 0
      while (i <= n - k) {
        out(i) = MinHashImpl.md5_60(new String(cps, i, k)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8), md)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `winnow_grams(text STRING, k INT) -> ARRAY<LONG>`. */
case class WinnowGrams(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "winnow_grams requires (STRING, foldable INT)")
    }
  override def nullSafeEval(text: Any, k: Any): Any =
    WinnowGramsImpl.compute(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k) => s"graft.functions.WinnowGramsImpl.compute($t, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowGrams =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "winnow_grams"
}

/** The winnowing SELECTION half: distinct minima of every width-`w`
  * window over the gram-hash array. Bit-identical to the compositional
  * explode → `min over (partition by id order by i rows between 0 and
  * w-1)` → full-window filter → distinct pipeline it replaces (proven in
  * KernelPropertySpec) — windows start at i = 0 … max(nh−w, 0), the last
  * one clipped to the array end, so a document with fewer than `w` grams
  * contributes the single minimum of all its grams. First-occurrence
  * distinct, like `array_distinct`. Fusing selection into the row kernel
  * removes a full explode + window-function shuffle on the doc id from
  * every winnowing query. */
object WindowMinDistinctImpl {
  def compute(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val lastStart = math.max(n - w, 0)
    var i = 0
    while (i <= lastStart) {
      var m = hs.getLong(i)
      var j = i + 1
      val end = math.min(i + w, n)
      while (j < end) {
        val v = hs.getLong(j)
        if (v < m) m = v
        j += 1
      }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** `window_min_distinct(hs ARRAY<BIGINT>, w INT) -> ARRAY<BIGINT>`. */
case class WindowMinDistinct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "window_min_distinct requires (ARRAY<BIGINT> containsNull=false, foldable INT)")
    }
  override def nullSafeEval(hs: Any, w: Any): Any =
    WindowMinDistinctImpl.compute(hs.asInstanceOf[ArrayData], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, w) => s"graft.functions.WindowMinDistinctImpl.compute($h, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowMinDistinct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "window_min_distinct"
}

object WordShingleFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_grams", exprs => WinnowGrams(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "window_min_distinct",
      exprs => WindowMinDistinct(exprs(0), exprs(1)), "scala_udf")
  }

  def wordShingles(text: Column, n: Int): Column =
    call_function("word_shingles", text, lit(n))

  def winnowGrams(text: Column, k: Int): Column =
    call_function("winnow_grams", text, lit(k))

  def windowMinDistinct(hs: Column, w: Int): Column =
    call_function("window_min_distinct", hs, lit(w))
}
