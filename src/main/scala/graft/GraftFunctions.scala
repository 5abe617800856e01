package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSim, JaccardSorted, JaccardSortedLong, MediaMeta,
  MinHashSig, RollingHashes, SimHash64, TopKRows}
import graft.model.{KvModel, TsModel}

/** SQL surface: the engine's custom expressions exposed to `spark.sql`,
  * plus view registration so free-form SQL runs over the TS/KV model —
  * the "real Spark SQL over the TS table" extension promised in SURVEY
  * §2.5. Two wirings:
  *  - [[GraftExtensions]] for new sessions
  *    (`.withExtensions(new GraftExtensions)` / `spark.sql.extensions`);
  *  - [[GraftFunctions.register]] to hot-register on an existing session.
  */
object GraftFunctions {

  private def buildCosine(exprs: Seq[Expression]): Expression =
    CosineSim(exprs(0), exprs(1))

  private def buildSimhash(exprs: Seq[Expression]): Expression =
    SimHash64(exprs.head)

  private def buildTopK(exprs: Seq[Expression]): Expression = {
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"topk_rows k must be an int literal, got $other")
    }
    val desc = exprs.lift(2).forall {
      case Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(s"topk_rows desc must be a bool literal, got $other")
    }
    TopKRows(exprs.head, k, desc)
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("cosine_sim", buildCosine _, "cosine similarity of two array<double>"),
    ("simhash64", buildSimhash _, "64-bit simhash of array<string>"),
    ("topk_rows", buildTopK _, "bounded per-group top-k of struct<long,long,...>"),
    ("media_meta", (exprs: Seq[Expression]) => MediaMeta(exprs.head),
      "container-header metadata of a media binary"),
    ("jaccard_sorted", (exprs: Seq[Expression]) => JaccardSorted(exprs(0), exprs(1)),
      "Jaccard similarity of two SORTED array<string> token sets (merge scan)"),
    ("jaccard_sorted_long", (exprs: Seq[Expression]) => JaccardSortedLong(exprs(0), exprs(1)),
      "Jaccard similarity of two SORTED array<long> hash sets (merge scan)"),
    ("minhash_sig", (exprs: Seq[Expression]) =>
        MinHashSig(exprs(0), intLit(exprs(1), "minhash_sig numHashes")),
      "minhash signature array<long> of an array<string> shingle set"),
    ("rolling_hashes", (exprs: Seq[Expression]) =>
        RollingHashes(exprs(0), intLit(exprs(1), "rolling_hashes k")),
      "k-gram rolling hashes array<long> of a string (winnowing input)"),
    ("jaro_winkler", (exprs: Seq[Expression]) =>
        graft.functions.JaroWinklerSim(exprs(0), exprs(1)),
      "Jaro-Winkler similarity of two strings (DuckDB-parity semantics)"))

  /** Hot-register on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** Register the model as temp views for free-form SQL. */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.table(spark, sfDir, "documents").createOrReplaceTempView("documents")
    Tables.table(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
    TsModel.ts(spark, sfDir).createOrReplaceTempView("ts")
    KvModel.changeLog(spark, sfDir).createOrReplaceTempView("kv_log")
  }
}

/** Session-extension wiring: custom expressions + the ms-div pushdown
  * optimizer rule. On an existing session, add the rule with
  * `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))
    }
    e.injectOptimizerRule(_ => graft.plans.PushMillisDivPredicates)
  }
}
