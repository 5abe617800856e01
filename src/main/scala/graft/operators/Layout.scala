package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-dimensional
  * scan pruning. A table range-partitioned and sorted by ONE column prunes
  * scans on that column only; interleaving the bits of two columns into one
  * sort key makes every written file cover a narrow RECTANGLE in (x, y)
  * space, so parquet min/max stats prune selective filters on EITHER
  * dimension — the standard lakehouse layout trick (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), here as a plain column expression plus a
  * clustered-write helper, no table format required.
  *
  * The 100 TB shape: layout is paid ONCE at write (a range repartition on
  * the z-key — one shuffle, same cost class as any partitioned write), and
  * every subsequent scan with a filter on either dimension reads a fraction
  * of the files. LayoutSpec quantifies it: the per-file bounding-box area
  * of the z-ordered layout is a small fraction of an insertion-ordered
  * write's.
  */
object Layout {

  /** Bit-interleaved Z-order key over two non-negative long columns,
    * `bits` low bits each (values are masked to `bits`, so out-of-range
    * inputs wrap rather than corrupt neighbors' bits — callers clustering
    * unbounded ids should pre-scale or accept the wrap, which only costs
    * locality, never correctness). Pure integer bit arithmetic: the same
    * formula is expressible in any engine, so the gate oracle replays it
    * term for term.
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xs = x.cast("long").bitwiseAND(lit((1L << bits) - 1L))
    val ys = y.cast("long").bitwiseAND(lit((1L << bits) - 1L))
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` clustered by the z-key: range-repartition into `nFiles`
    * z-runs, sort each run, write parquet. Every output file then covers a
    * contiguous z-range = a small (x, y) box, and the sortWithinPartitions
    * additionally orders row groups INSIDE each file so the parquet
    * reader's row-group stats prune too.
    */
  def clusteredWrite(df: DataFrame, path: String, z: Column, nFiles: Int): Unit = {
    // fail fast rather than silently overwrite-and-drop a caller's column
    require(!df.columns.contains("__z"),
      "clusteredWrite reserves the __z column name; rename it on the input")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
