package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** The salted join is an implementation of INNER EQUI-JOIN — the salt must
  * never change the result, only the exchange keys.
  */
class SkewJoinSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    val s = spark
    import s.implicits._
    // 90%-hot key 7 plus a fringe, including a big-side key with no dim row
    // (inner join drops it) and a dim key with no facts
    val big = (1L to 2000L).map(i => (if (i % 10 == 0) i % 7 else 7L, i))
      .toDF("k", "v")
    val dim = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"), (99L, "orphan"))
      .toDF("k", "tag")
    (big, dim)
  }

  test("salted join result is bit-identical to the plain join") {
    val (big, dim) = fixture
    val plain = big.join(dim, "k").select("k", "v", "tag")
    for (nSalt <- Seq(1, 3, 16)) {
      val salted = SkewJoin.saltedJoin(big, dim, "k", nSalt).select("k", "v", "tag")
      assert(salted.collect().toSet === plain.collect().toSet, s"nSalt=$nSalt")
      assert(salted.count() === plain.count(), s"nSalt=$nSalt") // dup-safe
    }
  }

  test("with broadcast off, the big side's exchange keys on (k, salt)") {
    val s = spark
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (big, dim) = fixture
      val p = SkewJoin.saltedJoin(big, dim, "k", 8)
        .queryExecution.executedPlan.toString
      // the shuffle must carry the salt — that IS the skew fix: the hot
      // key's rows spread over nSalt reducers instead of one
      assert("hashpartitioning\\(k#\\d+L, __salt".r.findFirstIn(p).isDefined, p.take(1500))
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salt column never escapes; schema equals the plain join's") {
    val (big, dim) = fixture
    val salted = SkewJoin.saltedJoin(big, dim, "k", 4)
    assert(!salted.columns.contains("__salt"))
    assert(salted.columns.toSeq === big.join(dim, "k").columns.toSeq)
  }
}
