package graft

import org.apache.spark.sql.SparkSession

/** Deliverable helper: write `.explain("formatted")` output for named
  * queries to `plans/<tag>/<query>_<suffix>.txt` — the before/after plan
  * evidence the optimization rounds commit alongside the code.
  *
  * {{{ sbt "runMain graft.PlanDump r13 before graph_fof graph_linkpred" }}}
  *
  * Runs at the BENCH scale factor (sf0.1) and core count so the dumped
  * plan is the one the bench actually executes (AQE's initial plan; the
  * runtime-adapted plan differs only in AQEShuffleRead/broadcast
  * conversions, which OPTIMIZATION_r13.md calls out where they matter).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/$tag/${q}_$suffix.txt"), txt)
      println(s"[plandump] wrote plans/$tag/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
