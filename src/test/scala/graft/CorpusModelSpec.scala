package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusAnalysis, CorpusModel}

class CorpusModelSpec extends AnyFunSuite with SparkTestBase {

  private val dir = new File("target/tmp-corpus-model").getAbsolutePath

  test("fit once, score later: matches the direct single-pass computation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    org.apache.commons.io.FileUtils.deleteQuietly(new File(dir))
    CorpusModel.fit(docs, dir)
    val fromModel = CorpusModel.scoreLogProb(spark, dir, docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val direct = CorpusAnalysis.unigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(fromModel === direct)
  }

  test("a frozen model scores unseen shards (add-one floor, no nulls)") {
    val s = spark
    import s.implicits._
    val newShard = Seq((900001L, "utterly unseen tokens here")).toDF("doc_id", "text")
    val scored = CorpusModel.scoreLogProb(spark, dir, newShard).collect()
    assert(scored.length === 1)
    assert(!scored.head.isNullAt(2))
    assert(scored.head.getDouble(2) < 0.0) // a log-prob, not a default
  }
}
