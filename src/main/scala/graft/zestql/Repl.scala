package graft.zestql

import graft.GraftEngine
import graft.operators._

/** Interactive ZestQL driver (`/root/reference/test/zestql/repl.re`):
  * banner, `> ` prompt, `quit`/`quit;` exits, blank lines loop, parse
  * errors report and continue. The reference REPL compiles statements into
  * zest CLIENT command lines (`test/zestql/zestql.re:53-119`); here the
  * engine is in-process, so statements EXECUTE — each one routes through
  * the same path language -> [[Compiler]] -> result codecs as the API.
  */
object Repl {

  private val aggName: Map[AggFn, String] = Map(
    AggSum -> "sum", AggCount -> "count", AggMin -> "min", AggMax -> "max",
    AggMean -> "mean", AggMedian -> "median", AggSd -> "sd")

  /** The read/delete path a [[TsQuery]] denotes (`zestql.re:72-90`
    * builds the same shapes for the client). */
  def pathOf(q: TsQuery): String = {
    val sel = q.selector match {
      case Since(t)          => s"/since/$t"
      case TimeRange(a, b)   => s"/range/$a/$b"
      case LastN(n)          => s"/last/$n"
      case FirstN(n)         => s"/first/$n"
      case Latest            => "/latest"
      case Earliest          => "/earliest"
      case Length            => "/length"
    }
    val filt = q.filter.map {
      case TagEquals(t, v)   => s"/filter/$t/equals/$v"
      case TagContains(t, v) => s"/filter/$t/contains/$v"
    }.getOrElse("")
    val agg = q.agg.map(a => s"/${aggName(a)}").getOrElse("")
    s"/ts/${q.ids.mkString(",")}$sel$filt$agg"
  }

  /** Execute one statement against the engine, returning the wire text. */
  def process(engine: GraftEngine, stmt: Statement): String = stmt match {
    case Connect(_, _) | Disconnect(_) => "ok" // session control is a no-op in-process
    case Post(v, series, tag) =>
      val fields = tag.map { case (k, tv) => s""""$k": "$tv", """ }.getOrElse("")
      engine.post(s"/ts/$series", s"""{$fields"value": $v}""")
        .fold(identity, _ => "created")
    case Get(q) => engine.get(pathOf(q))
    case ObserveStmt(series, mode, maxAge) =>
      engine.observe(s"/ts/$series", "json", mode.getOrElse("data"),
        maxAge.map(_.toLong).getOrElse(60L))
    case DeleteRange(ids, from, to, filt) =>
      val filtSeg = filt.map {
        case TagEquals(t, v)   => s"/filter/$t/equals/$v"
        case TagContains(t, v) => s"/filter/$t/contains/$v"
      }.getOrElse("")
      engine.delete(s"/ts/${ids.mkString(",")}/range/$from/$to$filtSeg")
        .fold(identity, _ => "deleted")
  }

  /** Run a (multi-statement) input line. Parse errors report, not throw. */
  def run(engine: GraftEngine, line: String,
          nowMs: Long = System.currentTimeMillis()): Seq[String] =
    try ZestQlParser.parseScript(line, nowMs).map(process(engine, _))
    catch { case e: ParseError => Seq(s"error: ${e.message}") }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new GraftEngine(spark)
    println("zestql v0.1")
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var done = false
    while (!done) {
      print("> ")
      Console.out.flush()
      val line = in.readLine()
      if (line == null || line.trim == "quit" || line.trim == "quit;") done = true
      else if (line.trim.nonEmpty) run(engine, line).foreach(println)
    }
    spark.stop()
  }
}
