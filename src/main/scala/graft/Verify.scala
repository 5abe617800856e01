package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS); Spark's reader rejects it
      // unless nanos are surfaced as long (TsModel handles both shapes).
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated gate filter for fast local iteration on a
    // single query; the driver never sets it, so its run is always full.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // ORACLE_ONLY skips query execution and just dumps oracle_sql.json +
    // queries.json — feeds tools/oracle_typecheck.py without a full run.
    val oracleOnly = sys.env.get("SPARK_GRAFT_ORACLE_ONLY").contains("1")
    SparkEntry.queries
      .filter { case (name, _) => !oracleOnly && only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Sketch-seeded oracles: fill the __..__ placeholders with VALUES
    // literals computed by the same Spark pipelines the gate queries use,
    // so DuckDB can replay candidate generation + verification itself.
    val aux = SparkEntry.oracleAux(spark, sfDir)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) =>
        val filled = aux.foldLeft(v) { case (s, (ph, lit)) => s.replace(ph, lit) }
        s"${q(k)}: ${q(filled)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full gate roster (oracle_sql covers only SQL-expressible gates):
    // tools/bench_complete.py diffs the per-query bench against this so a
    // round can't close with late-added gates unmeasured.
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
