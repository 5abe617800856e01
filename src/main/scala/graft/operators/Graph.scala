package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames.
  *
  * The reference has no graph surface; these are pipeline extensions (the
  * co-occurrence / similarity graphs that dedup clustering and content
  * analysis produce at corpus scale). [[Dedup.connectedComponents]] covers
  * reachability; this file covers local structure — triangles, the basis
  * of clustering-coefficient and community metrics.
  */
object Graph {

  /** Triangle enumeration by degree orientation (the MapReduce-era
    * standard: Suri & Vassilvitskii, WWW'11 "Counting triangles and the
    * curse of the last reducer" — the title is literally about our skew
    * mandate).
    *
    * Input: undirected distinct edges `(a, b)` with `a < b` (any
    * orderable node type, one row per edge). Naive wedge-join on raw
    * adjacency explodes on hub nodes: a degree-D node contributes D²
    * wedges THROUGH ONE JOIN KEY. Orienting every edge from its
    * lower-(degree, id) endpoint to the higher one caps every node's
    * OUT-degree at O(√m), so the self-join on the wedge apex is bounded
    * per key regardless of hubs — exactly the salting story, but achieved
    * by construction instead of by splitting.
    *
    * Plan: two shuffles to attach endpoint degrees, one self-join on the
    * apex, one equi-join probing the closing edge. Each triangle emerges
    * exactly once (the wedge (v1, v2) is ordered to match the closing
    * edge's orientation). Output: one row per triangle, nodes sorted
    * ascending as `(t1, t2, t3)`.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))

    // orient: u -> v with (deg_u, u) < (deg_v, v); carry v's key so the
    // wedge join can order its two leaves without re-attaching degrees
    val oriented = edges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            struct(col("db").as("kd"), col("b").as("kn")).as("kv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"),
              struct(col("da").as("kd"), col("a").as("kn")).as("kv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.kv").as("kv"))

    // wedges at apex u with leaves ordered by orientation key — the closing
    // edge, if present, is oriented exactly (v1 -> v2), so one probe finds
    // each triangle once
    val closing = oriented.select(col("u").as("cu"), col("v").as("cv"))
    oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.kv") < col("e2.kv"))
      .select(col("e1.u").as("w0"), col("e1.v").as("w1"), col("e2.v").as("w2"))
      .join(closing, col("w1") === col("cu") && col("w2") === col("cv"))
      .select(array_sort(array(col("w0"), col("w1"), col("w2"))).as("t"))
      .select(col("t")(0).as("t1"), col("t")(1).as("t2"), col("t")(2).as("t3"))
  }

  /** Per-node triangle participation counts (each triangle credits its
    * three corners) — the local clustering signal. Nodes in no triangle
    * are absent.
    */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("t1"), col("t2"), col("t3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

  /** Edge embeddedness: per edge, the number of triangles it closes
    * (= common neighbors of its endpoints) plus the neighborhood-Jaccard
    * in exact integer micros — the tie-strength weight behind graph
    * sparsification and community detection.
    *
    * Computing common neighbors for ARBITRARY pairs is inherently
    * quadratic in hub degree (the answer itself is D² pairs); restricting
    * to pairs that are already edges keeps the whole computation inside
    * the degree-oriented triangle join — output is |E| rows, skew-safe by
    * the same orientation argument. Jaccard over neighborhoods excluding
    * the endpoints themselves: `sup / (da + db - 2 - sup)`, floored in
    * micros; a denominator of 0 (two degree-1 endpoints) yields 0.
    */
  def edgeSupport(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // triangle corners arrive sorted ascending, so each side pair is
    // already in the edge table's (a < b) orientation
    val sup = triangles(edges)
      .select(explode(array(
        struct(col("t1").as("a"), col("t2").as("b")),
        struct(col("t1").as("a"), col("t3").as("b")),
        struct(col("t2").as("a"), col("t3").as("b")))).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("support"))
    edges
      .join(sup, Seq("a", "b"), "left")
      .withColumn("support", coalesce(col("support"), lit(0L)))
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .withColumn("j_micros",
        when(col("da") + col("db") - 2L - col("support") > 0L,
          expr("support * 1000000L div (da + db - 2L - support)"))
          .otherwise(0L))
      .select("a", "b", "support", "da", "db", "j_micros")
  }
}
