package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SetSimilarity, TextFunctions}

/** The long-hashed shingle merge must agree with the string merge on real
  * documents — guards the "collisions are negligible" assumption the
  * dedup_ngram oracle relies on.
  */
class JaccardParitySpec extends AnyFunSuite with SparkTestBase {

  test("jaccard_sorted_long(hashed grams) == jaccard_sorted(string grams) on testdata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 100 && size(TextFunctions.tokens(col("text"))) >= 2)
      .select(col("doc_id"),
        array_sort(TextFunctions.shingles(col("text"), 2)).as("grams_s"),
        array_sort(array_distinct(transform(
          TextFunctions.shingles(col("text"), 2), g => xxhash64(g)))).as("grams_h"))
    val pairs = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        SetSimilarity.jaccard_sorted(col("a.grams_s"), col("b.grams_s")).as("js"),
        SetSimilarity.jaccard_sorted_long(col("a.grams_h"), col("b.grams_h")).as("jh"))
    val mismatches = pairs.filter(col("js") =!= col("jh")).count()
    assert(mismatches === 0)
  }
}
