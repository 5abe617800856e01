package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: the point is PRUNING — after clusteredWrite, a filter on
  * either dimension should touch a small fraction of the files, where an
  * insertion-ordered write prunes only the dimension it happened to sort by.
  */
class LayoutSpec extends AnyFunSuite with SparkTestBase {

  private def fileRanges(path: String) =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
           min("y").as("y0"), max("y").as("y1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("z-ordered files prune both dimensions; row-order files only one") {
    val s = spark
    // 256x256 grid in row-major insertion order: x varies fastest, so a
    // plain write yields y-slabs (full x range per file)
    val grid = s.range(65536L).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val dir = Files.createTempDirectory("graft-layout").toFile
    val zPath = s"$dir/z"
    val linPath = s"$dir/lin"
    try {
      Layout.clusteredWrite(grid, zPath, Layout.zorder2(col("x"), col("y")), nFiles = 16)
      grid.repartitionByRange(16, col("y") * 256 + col("x")) // insertion order
        .write.parquet(linPath)
      val zr = fileRanges(zPath)
      val lr = fileRanges(linPath)
      assert(zr.length === 16 && lr.length === 16)
      def overlapX(r: (Long, Long, Long, Long)) = r._1 < 16 // x-band [0,16)
      def overlapY(r: (Long, Long, Long, Long)) = r._3 < 16 // y-band [0,16)
      // z-order: both bands touch few files (aligned quadrants would give 4;
      // sampled range boundaries blur that, so allow up to 8 of 16)
      assert(zr.count(overlapX) <= 8, s"x-band files: ${zr.count(overlapX)}")
      assert(zr.count(overlapY) <= 8, s"y-band files: ${zr.count(overlapY)}")
      // row-order: y prunes to ~1 file, x prunes NOTHING (every file spans x)
      assert(lr.count(overlapY) <= 2)
      assert(lr.count(overlapX) >= 15, s"x-band files: ${lr.count(overlapX)}")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("zorder2 interleaves bits: known values, and masks out-of-range input") {
    val s = spark
    import s.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65536L, 0L))
      .toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(x=3(0b11), y=5(0b101)): x bits at even positions ->
    // 0b01_00_11 reading (y2)(x1 y1)(x0 y0)... = x0 + 2*y0 + 4*x1 + 8*y1 + 16*x2 + 32*y2
    // x=3,y=5: 1 + 2*1 + 4*1 + 8*0 + 16*0 + 32*1 = 39
    assert(out === Seq(0L, 1L, 2L, 39L, 0L)) // 65536 masks to 0 at bits=16
  }
}
