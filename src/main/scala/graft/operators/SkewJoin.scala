package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skew-heavy keys — the static complement to AQE's
  * runtime skew-join split. AQE only splits a skewed SHUFFLE partition
  * after the map stage has already produced it; salting changes the key
  * itself, so the hot key's rows hash to `nSalt` different reducers from
  * the start. Use it when a key's row count is so large that even reading
  * one map-side partition of it serializes a task — the same discipline as
  * the sessionize/lag/pack bucket carries, applied to joins.
  *
  * Semantics: exactly an inner equi-join on `key` — the salt is an
  * implementation column that never escapes (SkewJoinSpec pins parity with
  * the plain join; the `events_salted_join` gate pins it against SQL).
  *
  * Mechanics: the big side salts each row by a hash of the row's own
  * columns mod `nSalt` (deterministic — re-runs and retries salt
  * identically; rows duplicated across all columns co-locate, which only
  * matters if the input is itself duplicate-heavy). The small side
  * replicates each row `nSalt` times via a generated salt array, so every
  * (key, salt) bucket finds its dim row. Replication multiplies the small
  * side's shuffle volume by `nSalt` — size it to the skew factor, not
  * higher; a small side that fits a broadcast needs no salting at all
  * (Spark will broadcast and there is no shuffle to skew).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalt: Int = 16): DataFrame = {
    require(nSalt >= 1, s"nSalt must be >= 1, got $nSalt")
    // fail fast rather than silently overwrite-and-drop a caller's column
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the inputs")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(nSalt.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalt.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
