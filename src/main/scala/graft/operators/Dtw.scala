package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded dynamic-time-warping distance between per-series piecewise
  * aggregates — the classic TS similarity measure behind series
  * clustering and nearest-pattern search (Sakoe & Chiba 1978; Berndt &
  * Clifford, KDD'94), absent from both the reference and Spark.
  *
  * Scale shape: DTW is an inherently sequential DP per pair, so the
  * distributed design fixes the per-pair work to a BOUNDED axis first —
  * each series collapses to its PAA bucket sequence (O(hundreds) per
  * month, never raw rows) via one map-side-combining aggregate, and only
  * then do pairs fan out across tasks, each computing an O(n·band) DP
  * over two small arrays. This is ladder case (d) (per-partition
  * imperative logic) applied where it is genuinely irreducible; costs
  * stay in exact integers so results hash-compare across engines.
  */
object Dtw {

  /** Banded DTW over integer sequences: cost `|a(i)-b(j)|`, steps
    * right/down/diagonal, cells with `|i-j| > band` excluded. Returns -1
    * when the end cell is unreachable (`|n-m| > band`).
    */
  def banded(a: Array[Long], b: Array[Long], band: Int): Long = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0 || math.abs(n - m) > band) return -1L
    val INF = Long.MaxValue / 4
    // rolling rows of the (banded) DP matrix
    var prev = Array.fill(m + 1)(INF)
    var cur = Array.fill(m + 1)(INF)
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, INF)
      var j = math.max(1, i - band)
      val jMax = math.min(m, i + band)
      while (j <= jMax) {
        val c = math.abs(a(i - 1) - b(j - 1))
        val best =
          if (i == 1 && j == 1) 0L
          else math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        if (best < INF) cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) >= INF) -1L else prev(m)
  }

  /** All-pairs banded DTW over a `(series_id, idx, v)` frame where `idx`
    * is the 1-based dense position of the bucket within its series and
    * `v` an integer aggregate. One bounded collect per series (the PAA
    * axis), pair fan-out `sid_a < sid_b`, per-pair DP in a task.
    */
  def pairDistances(spark: SparkSession, paa: DataFrame, band: Int): DataFrame = {
    import spark.implicits._
    val seqs = paa
      .groupBy("series_id")
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("v")))),
        x => x("v")).as("vs"))
    seqs.as("x").join(seqs.as("y"), col("x.series_id") < col("y.series_id"))
      .select(col("x.series_id").as("sid_a"), col("y.series_id").as("sid_b"),
        col("x.vs").as("va"), col("y.vs").as("vb"))
      .as[(String, String, Seq[Long], Seq[Long])]
      .map { case (sa, sb, va, vb) =>
        (sa, sb, va.length.toLong, vb.length.toLong,
          banded(va.toArray, vb.toArray, band))
      }
      .toDF("sid_a", "sid_b", "n_a", "n_b", "dtw")
  }
}
