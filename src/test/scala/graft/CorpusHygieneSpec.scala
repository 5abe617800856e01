package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pii
import graft.operators.{CorpusAnalysis, Dedup, TsOps}

class CorpusHygieneSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pii redaction scrubs emails, ipv4s and phone numbers, leaves clean text") {
    val in = docs(Seq(
      (1L, "write to alice.smith+spam@sub.example.co.uk or call 555-123-4567 now"),
      (2L, "server at 10.0.3.254 responded; version 1.2.3 is not an ip"),
      (3L, "no pii here at all")
    ))
    val out = in.select(col("doc_id"), Pii.redact(col("text")).as("clean"),
        Pii.emailCount(col("text")).as("ne"), Pii.ipv4Count(col("text")).as("ni"),
        Pii.phoneCount(col("text")).as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L)._1 === "write to <EMAIL> or call <PHONE> now")
    assert((out(1L)._2, out(1L)._3, out(1L)._4) === ((1L, 0L, 1L)))
    assert(out(2L)._1 === "server at <IP> responded; version 1.2.3 is not an ip")
    assert((out(2L)._2, out(2L)._3) === ((0L, 1L)))
    assert(out(3L)._1 === "no pii here at all")
    assert(in.filter(Pii.hasPii(col("text"))).count() === 2L)
  }

  test("version-like dotted numbers with >3 dots are not redacted as ips") {
    val out = docs(Seq((1L, "build 10.1.2.3.4 ok")))
      .select(Pii.redact(col("text")).as("c")).head().getString(0)
    // leading 4 octets match; the regex is non-lookaround so the trailing
    // .4 survives — pin the behavior so a pattern change is a conscious one
    assert(out === "build <IP>.4 ok")
  }

  test("ngram contamination scores overlap against the benchmark set") {
    val corpus = docs(Seq(
      (0L, "a b c d e f g h"),         // benchmark (id % 2 == 0 here)
      (1L, "a b c d e x y z"),         // shares the 1 leading 5-gram window
      (3L, "p q r s t u v w")          // disjoint
    ))
    val res = CorpusAnalysis.ngramContamination(corpus, col("doc_id") % 2 === 0, n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: 4 distinct 5-grams, exactly "a b c d e" is shared
    assert(res(1L) === ((4L, 1L)))
    assert(res(3L) === ((4L, 0L)))
    assert(!res.contains(0L)) // benchmark docs are not scored
  }

  test("contamination at n=13 (the published decontamination standard) on long docs") {
    val mk = (head: String, body: Seq[String]) => (head +: body).mkString(" ")
    val shared = Seq.tabulate(13)(i => s"s$i")     // one exact 13-gram
    val corpus = docs(Seq(
      (0L, mk("bench", shared ++ Seq.tabulate(20)(i => s"b$i"))),  // benchmark
      (1L, mk("evala", shared ++ Seq.tabulate(20)(i => s"e$i"))),  // shares 1 13-gram
      (3L, mk("evalb", Seq.tabulate(40)(i => s"z$i")))             // disjoint
    ))
    val res = CorpusAnalysis.ngramContamination(corpus, col("doc_id") % 2 === 0, n = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(res(1L) === 1L)   // exactly the planted window overlaps
    assert(res(3L) === 0L)
  }

  test("unigram logprob: uniform corpus scores ln(1/vocab) per token") {
    val corpus = docs(Seq((1L, "a b"), (2L, "c d")))
    val res = CorpusAnalysis.unigramLogProb(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected = BigDecimal(math.log(0.25)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res(1L) === expected)
    assert(res(2L) === expected)
  }

  test("bigram logprob: conditionals from head counts, hand-checked") {
    // pairs: (a,b) from doc 1, (a,c) from doc 2 -> P(b|a) = P(c|a) = 1/2
    val corpus = docs(Seq((1L, "a b"), (2L, "a c")))
    val res = CorpusAnalysis.bigramLogProb(corpus)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lnHalf = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res(1L) === ((1L, lnHalf)))
    assert(res(2L) === ((1L, lnHalf)))
  }

  test("incremental dedup drops incoming docs whose fingerprint is historical") {
    val corpus = docs(Seq(
      (1L, "seen before"), (2L, "also seen"),
      (10L, "seen  BEFORE"),   // fingerprint-equal to 1 (ws/case)
      (11L, "brand new"), (12L, "brand new")  // new, both kept (cross-incoming dups stay)
    ))
    val kept = Dedup.incremental(corpus, col("doc_id") < 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L))
  }

  test("ewma folds left-to-right with y0 = first frame value") {
    val s = spark
    import s.implicits._
    val ts = Seq(
      ("s1", 1L, 10.0, 1L), ("s1", 2L, 20.0, 2L), ("s1", 3L, 30.0, 3L),
      ("s2", 1L, 5.0, 4L)
    ).toDF("series_id", "t", "value", "event_id")
    val res = TsOps.ewma(ts, alpha = 0.2, window = 20)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(res(("s1", 1L)) === 10.0)
    assert(res(("s1", 2L)) === 12.0)             // 10*0.8 + 20*0.2
    assert(res(("s1", 3L)) === 15.6)             // 12*0.8 + 30*0.2
    assert(res(("s2", 1L)) === 5.0)
  }

  test("holt: level and trend follow the hand recursion") {
    val s = spark
    import s.implicits._
    val ts = Seq(("s1", 1L, 10.0, 1L), ("s1", 2L, 20.0, 2L), ("s1", 3L, 30.0, 3L))
      .toDF("series_id", "t", "value", "event_id")
    val res = TsOps.holt(ts, alpha = 0.5, beta = 0.3, window = 20)
      .collect().map(r => r.getLong(1) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(res(1L) === ((10.0, 0.0)))
    assert(res(2L) === ((15.0, 1.5)))     // l=.5*20+.5*10, b=.3*(15-10)
    // l3 = .5*30 + .5*(15+1.5) = 23.25; b3 = .3*(23.25-15) + .7*1.5 = 3.525
    assert(res(3L) === ((23.25, 3.525)))
  }

  test("chunking covers every token with the tail chunk running short") {
    val corpus = docs(Seq((1L, "a b c d e f"), (2L, "x")))
    val out = CorpusAnalysis.chunkTokens(corpus, window = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    // doc 1 (6 toks, w3 s2): chunks start at 0,2,4 -> sizes 3,3,2
    assert(out((1L, 0L)) === ((3L, "a")))
    assert(out((1L, 1L)) === ((3L, "c")))
    assert(out((1L, 2L)) === ((2L, "e")))
    // doc 2: a single short chunk
    assert(out((2L, 0L)) === ((1L, "x")))
    assert(out.size === 4)
  }

  test("ewma truncates to the trailing window") {
    val s = spark
    import s.implicits._
    val ts = (1L to 5L).map(i => ("s1", i, i.toDouble, i))
      .toDF("series_id", "t", "value", "event_id")
    val res = TsOps.ewma(ts, alpha = 0.5, window = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // frame holds only (x_{t-1}, x_t): y = x_{t-1}*0.5 + x_t*0.5
    assert(res(5L) === 4.5)
    assert(res(2L) === 1.5)
  }
}
