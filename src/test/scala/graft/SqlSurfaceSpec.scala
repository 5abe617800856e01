package graft

import org.scalatest.funsuite.AnyFunSuite

/** The custom Catalyst expressions registered for free-form `spark.sql` —
  * each callable by name, with the same semantics as the Column API.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestBase {

  test("jaccard_sorted over string and long token sets") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT round(jaccard_sorted(array('a','b'), array('b','c')), 6) AS j1,
        |       round(jaccard_sorted_long(array(1L,2L,3L), array(2L,3L,4L)), 6) AS j2"""
        .stripMargin).head()
    assert(r.getDouble(0) === 0.333333) // |{b}| / |{a,b,c}|
    assert(r.getDouble(1) === 0.5)      // |{2,3}| / |{1,2,3,4}|
  }

  test("minhash_sig: fixed length, equal inputs agree, disjoint inputs differ") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT minhash_sig(array('a b','b c','c d'), 16) AS a,
        |       minhash_sig(array('a b','b c','c d'), 16) AS b,
        |       minhash_sig(array('x y','y z'), 16) AS c""".stripMargin).head()
    val (a, b, c) = (rows.getSeq[Long](0), rows.getSeq[Long](1), rows.getSeq[Long](2))
    assert(a.length === 16)
    assert(a === b)
    assert(a != c)
  }

  test("jaro_winkler callable from SQL with the Column-API semantics") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT round(jaro_winkler('martha', 'marhta'), 6) AS a,
        |       round(jaro_winkler('ab', 'ba'), 6) AS b""".stripMargin).head()
    assert(r.getDouble(0) === 0.961111)
    assert(r.getDouble(1) === 0.0)
  }

  test("rolling_hashes: one hash per k-gram, shift-invariant on shared substrings") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hashes('abcdef', 3) AS h1,
        |       rolling_hashes('xabcdef', 3) AS h2""".stripMargin).head()
    val (h1, h2) = (r.getSeq[Long](0), r.getSeq[Long](1))
    assert(h1.length === 4)               // abc bcd cde def
    assert(h2.length === 5)               // xab + the same four
    assert(h2.drop(1) === h1)             // identical substring -> identical hashes
  }
}
