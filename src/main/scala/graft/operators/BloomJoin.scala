package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join: the pre-shuffle probe-pruning pattern.
  *
  * At 100 TB the expensive part of `probe LEFT SEMI JOIN members` is
  * shuffling the probe side; when most probe rows do NOT match, a bloom
  * filter built from the member keys rejects them at the scan, before any
  * exchange. This is the same shape Spark's own runtime bloom pushdown
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects — built
  * here explicitly so the filter is deterministic (fixed Knuth multiplier
  * hashes, not xxhash of a random seed) and therefore replayable by an
  * external SQL oracle term for term.
  *
  * Layout: `mBits` bits packed as 32-bit words carried in BIGINTs. 32-bit
  * words keep every shift below 2^31, so the identical arithmetic runs on
  * engines that RAISE on BIGINT shift overflow (DuckDB) and engines that
  * wrap (Spark) — a 1L<<63 word layout would diverge.
  *
  * The build side is ONE map-side-combining groupBy over at most mBits/32
  * cells — bounded state regardless of member count — followed by a
  * driver collect of the word table (mBits/32 longs; 1 MiB at mBits=2^23).
  * The probe side is a pure codegen'd expression over the literal bitmap:
  * no join, no exchange, evaluated inside the scan's WholeStageCodegen.
  *
  * Reference surface: the engine's path filters (`/root/reference/src/
  * filter.re`) select rows by tag membership; this operator is the
  * at-scale form of the same membership test.
  */
object BloomJoin {

  /** Fixed Knuth-style multiplier family — the same constants as the
    * `agg_count_min` / `events_bloom_join` DuckDB oracles, so a gate can
    * replay the filter exactly. k <= 4.
    */
  private val Hashes = Seq(
    (2654435761L, 1L), (2246822519L, 7L), (3266489917L, 13L), (668265263L, 31L))

  private val WordMasks: Seq[Long] = (0 until 32).map(1L << _)

  private def hashCol(key: Column, a: Long, b: Long, mBits: Int): Column =
    pmod(pmod(key * lit(a) + lit(b), lit(2147483647L)), lit(mBits.toLong))

  private def checkParams(mBits: Int, k: Int): Unit = {
    require(mBits > 0 && mBits % 32 == 0, s"mBits must be a positive multiple of 32, got $mBits")
    require(k >= 1 && k <= Hashes.length, s"k must be in [1, ${Hashes.length}], got $k")
    // hash operands must stay below 2^63: key < 2^31 enforced at build
    require(mBits.toLong <= 2147483647L, s"mBits must fit the modulus, got $mBits")
  }

  /** Fold the member keys (a non-negative integral column < 2^31; map
    * wider domains through a hash first) into the packed bitmap. Runs one
    * Spark job: explode to k rows per member, ONE partial-aggregable
    * groupBy over <= mBits/32 word cells, collect the tiny word table.
    */
  def buildBitmap(members: DataFrame, key: String, mBits: Int, k: Int): Array[Long] = {
    checkParams(mBits, k)
    val hs = array(Hashes.take(k).map { case (a, b) =>
      hashCol(col(key).cast("long"), a, b, mBits)
    }: _*)
    val words = members
      .select(explode(hs).as("h"))
      .select(shiftright(col("h"), 5).cast("int").as("w"),
        col("h").bitwiseAND(lit(31L)).cast("int").as("bit"))
      .groupBy("w")
      .agg(expr("bit_or(shiftleft(1L, bit))").as("word"))
      .collect()
    val arr = new Array[Long](mBits / 32)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership-test expression over a built bitmap: k word lookups in a
    * literal array + bit tests, AND-folded. Pure scalar expression —
    * stays inside WholeStageCodegen, never joins or shuffles. May return
    * true for a non-member (bloom false positive), never false for a
    * member.
    */
  def mightContain(key: Column, bitmap: Array[Long], mBits: Int, k: Int): Column = {
    checkParams(mBits, k)
    require(bitmap.length == mBits / 32,
      s"bitmap has ${bitmap.length} words, expected ${mBits / 32}")
    val words = typedLit(bitmap.toSeq)
    val masks = typedLit(WordMasks)
    Hashes.take(k).map { case (a, b) =>
      val h = hashCol(key.cast("long"), a, b, mBits)
      val word = element_at(words, shiftright(h, 5).cast("int") + 1)
      val mask = element_at(masks, h.bitwiseAND(lit(31L)).cast("int") + 1)
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** Approximate prefilter: keeps every member row plus the bloom's false
    * positives. The cheap first stage of a two-stage semi-join.
    */
  def prefilter(probe: DataFrame, key: String, bitmap: Array[Long],
                mBits: Int, k: Int): DataFrame =
    probe.filter(mightContain(col(key), bitmap, mBits, k))

  /** Exact semi-join with bloom pre-pruning: non-matching probe rows drop
    * map-side at the scan; only survivors (members + the small FP tail)
    * reach the exact LEFT SEMI exchange. Equivalent to a plain left-semi
    * on the key — the bloom only removes rows the semi-join would drop.
    */
  def semiJoin(probe: DataFrame, members: DataFrame, key: String,
               mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val bm = buildBitmap(members, key, mBits, k)
    prefilter(probe, key, bm, mBits, k)
      .join(members.select(col(key)).distinct(), Seq(key), "left_semi")
  }
}
