package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash
import graft.operators.HyperCat

class HyperCatAndHashSpec extends AnyFunSuite with SparkTestBase {

  private val validItem =
    """{"href": "/ts/sensor1",
      |"item-metadata": [
      |  {"rel": "urn:X-hypercat:rels:hasDescription:en", "val": "temp sensor"},
      |  {"rel": "urn:X-hypercat:rels:isContentType", "val": "application/json"}
      |]}""".stripMargin

  test("item validation follows hc.re:20-41") {
    assert(HyperCat.isValidItem(validItem))
    assert(!HyperCat.isValidItem("""{"item-metadata": []}"""))  // no href
    assert(!HyperCat.isValidItem("""{"href": "/x"}"""))          // no metadata
    assert(!HyperCat.isValidItem(                                // missing isContentType rel
      """{"href":"/x","item-metadata":[{"rel":"urn:X-hypercat:rels:hasDescription:en","val":"d"}]}"""))
    assert(!HyperCat.isValidItem(                                // entry missing val
      """{"href":"/x","item-metadata":[{"rel":"urn:X-hypercat:rels:hasDescription:en"},
        |{"rel":"urn:X-hypercat:rels:isContentType","val":"c"}]}""".stripMargin))
    assert(!HyperCat.isValidItem("not json"))
  }

  test("update + catalogue assembly round-trips through the KV LWW store") {
    val row1 = HyperCat.update(spark, validItem, writeTs = 100L, eventId = 1L)
    val item2 = validItem.replace("/ts/sensor1", "/ts/sensor2")
      .replace("temp sensor", "humidity sensor")
    val row2 = HyperCat.update(spark, item2, writeTs = 200L, eventId = 2L)
    // re-register sensor1 with updated metadata: LWW keeps the newest
    val item1b = validItem.replace("temp sensor", "temp sensor v2")
    val row3 = HyperCat.update(spark, item1b, writeTs = 300L, eventId = 3L)
    val log = row1.union(row2).union(row3)
    val cat = HyperCat.catalogue(log)
    assert(cat.contains(""""href":"/ts/sensor1""""))
    assert(cat.contains(""""href":"/ts/sensor2""""))
    assert(cat.contains("temp sensor v2") && !cat.contains("\"temp sensor\""))
    assert(cat.contains("catalogue-metadata"))
    assertThrows[IllegalArgumentException](
      HyperCat.update(spark, """{"href":"/x"}""", 400L, 4L))
  }

  test("rolling hashes: O(1) shift matches direct polynomial evaluation") {
    val s = spark
    import s.implicits._
    val df = Seq(("abcdef", 1L)).toDF("text", "id")
    val got = df.select(RollingHash.rolling_hashes(col("text"), 3)).head().getSeq[Long](0)
    def direct(str: String): Long =
      str.getBytes("UTF-8").foldLeft(0L)((h, b) => h * RollingHash.Base + (b & 0xffL))
    assert(got === Seq("abc", "bcd", "cde", "def").map(direct))
  }

  test("doc fingerprint is whitespace/case-canonical and edit-tolerant at distance") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base.toUpperCase),                       // case variant
      (3L, base.replace(" ", "   ")),               // whitespace variant
      (4L, base + " with a changed tail ending")    // suffix edit
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), RollingHash.doc_fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) === fps(3L))
    // suffix edit usually preserves the min window; at minimum it's deterministic
    assert(fps(4L) === df.filter(col("doc_id") === 4).select(
      RollingHash.doc_fingerprint(col("text"))).head().getLong(0))
  }
}
