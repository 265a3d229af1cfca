package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: hand-checked interleave, the exact aligned-square
  * bucket property, engine↔oracle formula generation from one loop,
  * and the actual payoff — per-file 2D bounding boxes tighter than any
  * 1-D sort can give. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: hand-checked interleave, x even bits / y odd bits") {
    val got = Seq((3L, 1L), (0L, 3L), (5L, 0L), (7L, 7L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 3).as("z"))
      .as[Long].collect().toSeq
    // z(3,1)=x:101? no — x=0b011 → bits 0,2 ; y=0b001 → bit 1 ⇒ 0b000111=7
    // z(0,3)=y bits 1,3 ⇒ 0b1010=10 ; z(5,0)=x bits 0,4 ⇒ 0b10001=17
    // z(7,7)=0b111111=63
    assert(got == Seq(7L, 10L, 17L, 63L), got)
  }

  test("aligned-square property: dropping 2k z-bits buckets EXACTLY " +
    "by (x>>k, y>>k)") {
    // uniform pseudo-random points (deterministic md5-derived) in a
    // 1024×1024 space, k=5: multi-point buckets whose x- and y-extents
    // must each fit inside one 32-aligned cell
    val pts = spark.range(0, 2000).select(
      pmod(graft.operators.Dedup.md5_60(
        concat(lit("zx"), col("id").cast("string"))), lit(1024L)).as("x"),
      pmod(graft.operators.Dedup.md5_60(
        concat(lit("zy"), col("id").cast("string"))), lit(1024L)).as("y"))
    val audit = Layout.zOrderAudit(pts, col("x"), col("y"),
      zShift = 10, bits = 10).collect()
    assert(audit.length > 100, s"expected many buckets: ${audit.length}")
    assert(audit.exists(_.getAs[Long]("n_rows") > 1L),
      "fixture too sparse to exercise the property")
    audit.foreach { r =>
      val (x0, x1) = (r.getAs[Long]("x_min"), r.getAs[Long]("x_max"))
      val (y0, y1) = (r.getAs[Long]("y_min"), r.getAs[Long]("y_max"))
      assert(x0 >> 5 == x1 >> 5 && y0 >> 5 == y1 >> 5,
        s"bucket ${r.getAs[Long]("zb")} leaks its 32-cell: " +
          s"x[$x0,$x1] y[$y0,$y1]")
    }
  }

  test("zValueSql generates the identical formula: Spark vs DuckDB-" +
    "shaped SQL evaluated by Spark") {
    // evaluate the generated SQL text in Spark itself — the >> & | <<
    // operator subset is shared verbatim by Spark SQL and DuckDB, so
    // agreement here plus the oracle hash gate pins all three
    val sqlExpr = Layout.zValueSql("x", "y", 21)
    val df = Seq((123456L, 654321L), (0L, 0L), ((1L << 21) - 1, 1L))
      .toDF("x", "y")
    val both = df.select(
      Layout.zValue(col("x"), col("y"), 21).as("a"),
      expr(sqlExpr).as("b")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("zOrderLayout: per-file bounding boxes jointly tighter than a " +
    "1-D sort's") {
    val pts = spark.range(0, 4000).select(
      pmod(graft.operators.Dedup.md5_60(
        concat(lit("fx"), col("id").cast("string"))),
        lit(1L << 21)).as("x"),
      pmod(graft.operators.Dedup.md5_60(
        concat(lit("fy"), col("id").cast("string"))),
        lit(1L << 21)).as("y"))
    val full = (1L << 21).toDouble
    def meanRanges(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      assert(files.size >= 6, s"files: ${files.size}")
      val rs = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
        ((r.getLong(1) - r.getLong(0)) / full,
          (r.getLong(3) - r.getLong(2)) / full)
      }
      (rs.map(_._1).sum / rs.size, rs.map(_._2).sum / rs.size)
    }
    val zDir = Files.createTempDirectory("graft_zlayout").toString
    Layout.zOrderLayout(pts, "x", "y", numFiles = 8)
      .write.mode("overwrite").parquet(zDir)
    val xDir = Files.createTempDirectory("graft_xlayout").toString
    pts.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)
    val (zx, zy) = meanRanges(zDir)
    val (sx, sy) = meanRanges(xDir)
    // the 1-D sort nails x (~1/8 per file) but leaves y wide open
    // (~1.0); the z-curve bounds BOTH — its per-file boxes must be
    // jointly (sum of mean extents) tighter, and its y-extent far
    // below the 1-D layout's
    assert(zy < sy * 0.75, s"z yr=$zy vs x-sort yr=$sy")
    assert(zx + zy < sx + sy, s"z ($zx,$zy) vs x-sort ($sx,$sy)")
    assert(zx < 0.9 && zy < 0.9, s"z box not bounded: ($zx,$zy)")
  }
}
