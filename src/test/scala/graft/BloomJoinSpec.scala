package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

/** The bloom semi-join is an implementation of LEFT SEMI JOIN — the filter
  * may only remove rows the exact join would drop, and the probe path must
  * stay a pure scalar expression (no exchange, no join).
  */
class BloomJoinSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    val s = spark
    import s.implicits._
    // 10k probe rows over keys 0..999; members are the multiples of 7
    // below 500 — most probe rows do not match, the regime bloom is for
    val probe = (1L to 10000L).map(i => (i % 1000, i)).toDF("k", "v")
    val members = (0L until 500L by 7L).toDF("k")
    (probe, members)
  }

  test("semiJoin is bit-identical to the plain left-semi join") {
    val (probe, members) = fixture
    val plain = probe.join(members, Seq("k"), "left_semi")
    for (mBits <- Seq(32, 256, 4096); k <- Seq(1, 4)) {
      val out = BloomJoin.semiJoin(probe, members, "k", mBits, k)
      assert(out.collect().toSet === plain.collect().toSet, s"mBits=$mBits k=$k")
    }
  }

  test("prefilter never drops a member row, and rejects at small mBits FP rates") {
    val (probe, members) = fixture
    val memberKeys = members.collect().map(_.getLong(0)).toSet
    val bm = BloomJoin.buildBitmap(members, "k", mBits = 256, k = 4)
    val kept = BloomJoin.prefilter(probe, "k", bm, 256, 4)
      .collect().map(_.getLong(0)).toSet
    assert(memberKeys.subsetOf(kept), "bloom dropped a member (false negative)")
    // 72 members x4 hashes in 256 bits: non-members must still mostly drop
    val nonMemberKept = kept.diff(memberKeys).size
    assert(nonMemberKept < 500, s"bloom rejected almost nothing: $nonMemberKept FP keys")
    assert(kept.size < 1000, "bloom kept every key — filter is vacuous")
  }

  test("mightContain replays the scala bitmap model exactly") {
    val (probe, members) = fixture
    val mBits = 256
    val bm = BloomJoin.buildBitmap(members, "k", mBits, 4)
    // fold the same hashes in plain scala
    val hs = Seq((2654435761L, 1L), (2246822519L, 7L), (3266489917L, 13L), (668265263L, 31L))
    def buckets(u: Long) = hs.map { case (a, b) => (((u * a + b) % 2147483647L) % mBits).toInt }
    val model = new Array[Long](mBits / 32)
    members.collect().map(_.getLong(0)).foreach { u =>
      buckets(u).foreach(h => model(h / 32) |= (1L << (h % 32)))
    }
    assert(bm.toSeq === model.toSeq, "built bitmap differs from the scala fold")
    val out = probe.select(col("k"),
      BloomJoin.mightContain(col("k"), bm, mBits, 4).as("hit")).collect()
    out.foreach { r =>
      val k = r.getLong(0)
      val expected = buckets(k).forall(h => (model(h / 32) & (1L << (h % 32))) != 0)
      assert(r.getBoolean(1) === expected, s"key $k")
    }
  }

  test("probe path is expression-only: no exchange, no join, codegen'd") {
    val (_, members) = fixture
    val bm = BloomJoin.buildBitmap(members, "k", 256, 4)
    // a range source (not a local Seq, which ConvertToLocalRelation folds
    // away entirely) so the filter is visible in the executed plan
    val probe = spark.range(10000).select(pmod(col("id"), lit(1000L)).as("k"))
    val plan = BloomJoin.prefilter(probe, "k", bm, 256, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
    // the "*(1)" stage prefix marks whole-stage codegen in the simple form
    assert(plan.contains("*(1) Filter"), plan.take(1500))
  }

  test("parameter guards: bad mBits, bad k, wrong bitmap length") {
    val (_, members) = fixture
    intercept[IllegalArgumentException](BloomJoin.buildBitmap(members, "k", 100, 4))
    intercept[IllegalArgumentException](BloomJoin.buildBitmap(members, "k", 256, 5))
    intercept[IllegalArgumentException](
      BloomJoin.mightContain(lit(1L), Array(0L), 256, 4))
  }
}
