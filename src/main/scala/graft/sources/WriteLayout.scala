package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared file-layout policy for partitioned writes (r13 optimization,
  * guide §6 "aim for output files in the 128 MB–1 GB range; small files
  * hurt twice").
  *
  * Every `partitionBy` write opens one file per (task, partition-value)
  * pair, so an unclustered frame with T input tasks writes up to T files
  * in EVERY touched directory — the classic lake small-files explosion,
  * paid again by each subsequent read/delete/compact that lists and opens
  * them. Clustering by the partition columns first bounds each dir to the
  * salt width; the salt keeps a hot partition off a single writer task.
  *
  * The salt WIDTH is size-adaptive rather than a constant: a fixed width
  * multiplies the file count of small tables (4× at gate scale) while
  * still underproviding a truly hot partition at lake scale. One bucket
  * per ~64 MB of estimated input, floor 1, cap 32; plans with no usable
  * estimate (in-memory buffers surface the `defaultSizeInBytes` sentinel)
  * keep a conservative 4. `spark.graft.writeSaltBuckets` overrides.
  */
object WriteLayout {

  def saltBuckets(df: DataFrame): Int = {
    val conf = df.sparkSession.conf
    conf.getOption("spark.graft.writeSaltBuckets").map(_.toInt).getOrElse {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val unknown = BigInt(Long.MaxValue) / 2
      if (bytes <= 0 || bytes >= unknown) 4
      else math.max(1L, math.min(32L,
        ((bytes + 64L * 1024 * 1024 - 1) / (64L * 1024 * 1024)).toLong)).toInt
    }
  }

  /** Cluster `df` by its write-partition columns plus a size-adaptive salt
    * on `saltKey` — the step every `partitionBy` write should run first.
    */
  def clusterForWrite(df: DataFrame, partCols: Seq[String],
                      saltKey: Column): DataFrame = {
    val salt = saltBuckets(df)
    if (salt <= 1) df.repartition(partCols.map(col): _*)
    else df.repartition(
      partCols.map(col) :+ pmod(xxhash64(saltKey), lit(salt.toLong)): _*)
  }
}
