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
    val oriented = orientEdges(edges)
    // EXPLICIT apex repartition: |E| input rows expand to Σ outdeg² wedge
    // rows, so AQE's size-based planning must not collapse the join's
    // parallelism (see [[coOccurrenceEdges]]; the closing-edge probe join
    // is left to AQE — its build side is small and it CONTRACTS)
    val byApex = oriented.repartition(
      edges.sparkSession.sparkContext.defaultParallelism, col("u"))
    trianglesFromOriented(byApex, oriented)
  }

  /** The degree orientation of an `(a < b)` edge list: each edge pointed
    * from its lower-(degree, id) endpoint, the far endpoint's orientation
    * key carried as `kv` so the wedge join can order its leaves without
    * re-attaching degrees. This IS the persisted form of the triangle
    * index: write it bucketed+sorted by `u` and [[trianglesStored]] runs
    * the wedge self-join exchange-free.
    */
  private[graft] def orientEdges(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    edges
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
  }

  /** [[triangles]] over a PERSISTED oriented adjacency (the
    * [[orientEdges]] view stored bucketed+sorted by `u`): the apex
    * self-join reads the bucket layout directly — zero exchanges below it
    * (PlanShapeSpec walks the tree), the [[fofCensusStored]] contract
    * applied to the triangle family. Output bit-identical to the built
    * path (spec-pinned). No repartition pin here: bucketing fixed the
    * apex distribution at write time.
    */
  def trianglesStored(orientedByU: DataFrame): DataFrame =
    trianglesFromOriented(orientedByU, orientedByU)

  /** Wedge + closing-edge probe shared by the built and stored paths —
    * wedges at apex u with leaves ordered by orientation key; the closing
    * edge, if present, is oriented exactly (v1 -> v2), so one probe finds
    * each triangle once.
    */
  private def trianglesFromOriented(byApex: DataFrame,
                                    closingSrc: DataFrame): DataFrame = {
    val closing = closingSrc.select(col("u").as("cu"), col("v").as("cv"))
    byApex.as("e1")
      .join(byApex.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.kv") < col("e2.kv"))
      .select(col("e1.u").as("w0"), col("e1.v").as("w1"), col("e2.v").as("w2"))
      .join(closing, col("w1") === col("cu") && col("w2") === col("cv"))
      .select(array_sort(array(col("w0"), col("w1"), col("w2"))).as("t"))
      .select(col("t")(0).as("t1"), col("t")(1).as("t2"), col("t")(2).as("t3"))
  }

  /** Per-node counts off an already-built triangle list — shared tail of
    * [[triangleCounts]] and the stored-layout gate.
    */
  def triangleCountsFrom(tri: DataFrame): DataFrame =
    tri.select(explode(array(col("t1"), col("t2"), col("t3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

  /** Per-node triangle participation counts (each triangle credits its
    * three corners) — the local clustering signal. Nodes in no triangle
    * are absent.
    */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangleCountsFrom(triangles(edges))

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

  /** Co-occurrence edges: distinct unordered node pairs sharing a blocking
    * key (e.g. users active in the same (event_type, time-bucket)) — the
    * edge builder behind the co-occurrence graph gates.
    *
    * Per-key pair generation is inherently B² in the key's membership B,
    * and a plain self-join emits ALL of a hot key's pairs from the one
    * task that owns it — the same straggler [[Dedup.minhashLsh]] guards
    * against. Same cure: members of keys above `hotCap` split into
    * `k = ceil(B/cap)` pseudo-random blocks and join TRIANGULARLY — a
    * member in block `g` replicates to cells `(g, g..k-1)` and
    * `(0..g-1, g)` of the upper-triangular block grid on both join sides,
    * so every unordered pair meets in at least one cell and the
    * `distinct` collapses the shared-cross repeats. The edge SET is
    * bit-identical to the plain join at any cap; cold keys have k = 1 and
    * reduce to it exactly. Cost: one map-combinable count per key plus
    * ~k replicas per hot-key member — proportional to the inherent B²/cap
    * pair work, never more than a constant factor over it.
    *
    * `occ` must be one row per (node, key) — pre-`distinct` if needed.
    */
  def coOccurrenceEdges(occ: DataFrame, node: String, keys: Seq[String],
                        hotCap: Int = 4096): DataFrame = {
    val counts = occ.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bc"))
    // No bucket over the cap → k = 1 and every member sits in cell (0, 0),
    // so the triangular block join IS the plain keyed self-join — run that
    // directly and skip the count join + per-member cell explode (same
    // emptiness-probe pattern as [[wedges]]; Round9OpsSpec pins edge-set
    // equality of the two paths on a hot bucket that trips the cap).
    val maxB = Option(counts.agg(max(col("bc"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (maxB <= hotCap) {
      val x = occ.repartition(
        occ.sparkSession.sparkContext.defaultParallelism, keys.map(col): _*)
      val keyEqP = keys.map(kn => col(s"x.$kn") === col(s"y.$kn")).reduce(_ && _)
      return x.as("x").join(x.as("y"),
          keyEqP && col(s"x.$node") < col(s"y.$node"))
        .select(col(s"x.$node").as("a"), col(s"y.$node").as("b"))
        .distinct()
    }
    val blocked = occ.join(counts, keys)
      .withColumn("k", ceil(col("bc") / hotCap).cast("int"))
      .withColumn("g", pmod(xxhash64(col(node)), col("k")).cast("int"))
    val cells = blocked.select(
      keys.map(col) :+ col(node) :+
        explode(concat(
          transform(sequence(col("g"), col("k") - 1),
            j => struct(col("g").as("i"), j.as("j"))),
          // (0..g-1, g) without sequence(0, g-1), which DESCENDS for g = 0
          slice(transform(sequence(lit(0), col("g")),
            i => struct(i.as("i"), col("g").as("j"))), lit(1), col("g")))).as("c"): _*)
      .select(keys.map(col) :+ col(node) :+
        col("c.i").as("i") :+ col("c.j").as("j"): _*)
      // EXPLICIT join-key repartition: the cell sides are small relative to
      // their B²-expanding self-join output, so AQE's size-based planning
      // (broadcast conversion / partition coalescing) collapses the join's
      // parallelism exactly when the expansion makes parallelism matter
      // most. A user repartition pins the distribution AQE must honor;
      // measured 15 s → 2 s on the wedge twin of this join at sf0.1.
      .repartition(occ.sparkSession.sparkContext.defaultParallelism,
        keys.map(col) :+ col("i") :+ col("j"): _*)
    val keyEq = keys.map(kn => col(s"x.$kn") === col(s"y.$kn"))
      .reduce(_ && _)
    cells.as("x").join(cells.as("y"),
        keyEq && col("x.i") === col("y.i") && col("x.j") === col("y.j") &&
          col(s"x.$node") < col(s"y.$node"))
      .select(col(s"x.$node").as("a"), col(s"y.$node").as("b"))
      .distinct()
  }

  /** Friends-of-friends census: per node, the direct degree and the count
    * of distinct nodes at distance exactly 2 — the link-prediction
    * candidate pool size. Input: undirected distinct edges `(a, b)` with
    * `a < b` (the anti-join keys on that stored orientation).
    *
    * The wedge join keys on the wedge MIDPOINT, so an unguarded plan puts
    * one hub's deg² wedge fan-out on a single reducer (the same curse of
    * the last reducer [[triangles]] defeats by orientation — but an exact
    * FoF census cannot orient away the work: counting a hub's FoF set IS
    * deg² wedge work). So redistribute instead of avoid: midpoints with
    * degree > `hotCap` get the FULL-SQUARE block decomposition — the
    * incoming side hashes its far endpoint into one of `k = ceil(deg/cap)`
    * row blocks and replicates across the k column blocks; the outgoing
    * side hashes into column blocks and replicates across row blocks. A
    * wedge (u → mid → z) meets in exactly the one cell
    * `(h(u) mod k, h(z) mod k)`, so the wedge multiset — and after
    * `distinct` + anti-join, the census — is bit-identical to the plain
    * join, with no task owning more than ~cap² of a hub's wedges. Cold
    * midpoints have k = 1 and reduce to the plain join exactly.
    */
  def fofCensus(edges: DataFrame, hotCap: Int = 4096): DataFrame = {
    val und = undirected(edges)
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    fofFromWedges(wedges(und, deg, hotCap), deg, edges)
  }

  /** FoF census over a PERSISTED graph layout: `undByV` / `undByU` are the
    * SAME undirected (u, v) view stored twice, bucketed+sorted on `v` and
    * `u` respectively (the adjacency-both-ways layout every disk-resident
    * graph engine keeps); `edges` is the stored `a < b` edge list. The
    * wedge join then reads both bucket layouts directly — ZERO exchanges
    * below it (PlanShapeSpec pins this), where the build-from-scratch path
    * pays two |wedge-input| shuffles per query. This is the pay-
    * partitioning-once pattern at 100 TB: the layout amortizes over every
    * census / link-prediction / triangle query that follows.
    *
    * No hot-midpoint guard here — bucketing fixes the DISTRIBUTION at
    * write time, so a hub's wedge fan-out lands in its bucket regardless;
    * for hub-heavy graphs the guarded [[fofCensus]] remains the skew-safe
    * builder. Census output is bit-identical to it (spec-pinned).
    */
  def fofCensusStored(undByV: DataFrame, undByU: DataFrame,
                      edges: DataFrame): DataFrame = {
    val deg = undByU.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    fofFromWedges(wedgesStored(undByV, undByU), deg, edges)
  }

  /** The plain wedge multiset over the two bucketed undirected views —
    * exactly the multiset [[wedges]] produces (the guard there is
    * output-invariant), but keyed on the stored bucket layouts so the
    * join needs no exchange.
    */
  private def wedgesStored(undByV: DataFrame, undByU: DataFrame): DataFrame =
    undByV.as("e1").join(undByU.as("e2"),
        col("e1.v") === col("e2.u") && col("e1.u") =!= col("e2.v"))
      .select(col("e1.u").as("src"), col("e2.v").as("dst"))

  /** Census tail shared by the built and stored wedge paths — one body so
    * the two can never drift. UNORDERED pair form: the wedge multiset
    * carries every ordered (src, dst) twice (once per direction);
    * `src < dst` halves it BEFORE the distinct (inside the join's codegen
    * stage), the anti-join runs against the stored a < b edge list
    * directly (|E| rows, not the 2|E| undirected view), and each
    * surviving pair credits BOTH endpoints' census.
    */
  private def fofFromWedges(wedgeMultiset: DataFrame, deg: DataFrame,
                            edges: DataFrame): DataFrame = {
    val two = wedgeMultiset
      .filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .distinct()
    val pairs = two.join(edges.select(col("a"), col("b")),
      Seq("a", "b"), "left_anti")
    // ONE pass over the surviving pairs (r14): a unionAll of two selects
    // of the same frame REPLAYS the whole wedge-join + distinct +
    // anti-join subtree per branch (Spark shares exchanges, not plan
    // subtrees — the edges_indexed before-plan shows the census twice);
    // exploding both endpoints from a single scan credits each census
    // identically for half the work
    val fof = pairs.select(explode(array(col("a"), col("b"))).as("src"))
      .groupBy("src").agg(count(lit(1)).as("n_fof"))
    deg.join(fof, col("u") === col("src"), "left")
      .select(col("u").as("node"), col("deg"),
        coalesce(col("n_fof"), lit(0L)).as("n_fof"))
  }

  private def undirected(edges: DataFrame): DataFrame =
    edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))

  /** Incremental maintenance of the persisted two-order adjacency (the
    * [[fofCensusStored]] layout): append an edge batch bucket-aligned into
    * both stored orders. No resident data is relaid — the batch's rows
    * land as new files inside their hash buckets, so the write costs
    * O(batch) while the wedge join keeps reading both layouts
    * exchange-free (spec-pinned, census hash-equal to a full rebuild).
    * This is the daily-edge-batch answer to the pay-partitioning-once
    * pattern: without it the layout is write-once and every batch forces
    * a full relayout.
    *
    * `dedupResident` guards against re-appending rows already stored,
    * per TABLE: the batch semi-probes the resident table on its bucket
    * column (a column-pruned scan of the two key columns — NOT free: a
    * typical batch touches every bucket, so the probe reads the resident
    * keys once), then anti-joins. Because each table dedups against
    * itself, a crash between the two appends is healed by simply
    * RE-RUNNING the batch with dedup on — the table that already has it
    * appends nothing, the other catches up; idempotent retry substitutes
    * for cross-table atomicity (single writer, like
    * [[graft.sources.TsStorage]]). Callers whose batches are new by
    * construction (the daily-ingest norm: upstream event-time uniqueness)
    * pass `dedupResident = false` and the append is pure O(batch) —
    * two bucket-aligned writes, no resident I/O at all.
    *
    * The degree-ORIENTED triangle layout ([[trianglesStored]]) deliberately
    * has no append path: orientation is a function of GLOBAL degrees, so a
    * batch can flip the stored direction of resident edges — that layout
    * rebuilds via [[orientEdges]].
    *
    * `edges` is the usual distinct `(a < b)` batch; `nBuckets` must match
    * the stored tables' bucket spec (Spark rejects a mismatch).
    */
  /** Bucket count for the per-run stored graph layouts: derived from the
    * session's parallelism (floor 16) so the bucket-aligned pre-write
    * repartition never SERIALIZES the write below the core count — the
    * r13 fixed 16 cost graph_edges_append/indexed 19–25% at 32 cores (r13
    * verdict item 2). The gates create their tables per run, so the count
    * is a free parameter; a long-lived lake table would pin it explicitly.
    */
  def bucketCount(spark: org.apache.spark.sql.SparkSession): Int =
    math.max(16, spark.sparkContext.defaultParallelism)

  /** [[appendEdges]] for the single-table layout: the undirected view is
    * symmetric, so one bucketed-by-u table serves both wedge orders (the
    * by-v side is the same table with endpoints swapped — the projection
    * alias carries the bucket partitioning). Appends the batch's fresh
    * undirected rows bucket-aligned into that one table: O(batch), one
    * file per touched bucket, resident rows never rewritten.
    */
  def appendEdgesOneOrder(edges: DataFrame, byUTable: String,
                          nBuckets: Int = 16,
                          dedupResident: Boolean = true): Unit = {
    val spark = edges.sparkSession
    val und = undirected(edges.select(col("a"), col("b"))).distinct()
      .localCheckpoint() // the dedup probe + the write both read it
    val fresh =
      if (!dedupResident) und
      else {
        val resident = spark.table(byUTable)
          .join(broadcast(und.select(col("u")).distinct()), Seq("u"), "left_semi")
        und.join(resident, Seq("u", "v"), "left_anti")
      }
    fresh.repartition(nBuckets, col("u")).write
      .mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
      .bucketBy(nBuckets, "u").sortBy("u").saveAsTable(byUTable)
    freeCheckpoint(und)
  }

  def appendEdges(edges: DataFrame, byUTable: String, byVTable: String,
                  nBuckets: Int = 16, dedupResident: Boolean = true): Unit = {
    val spark = edges.sparkSession
    val und = undirected(edges.select(col("a"), col("b"))).distinct()
      .localCheckpoint() // two per-table dedups + two writes read it
    def freshFor(table: String, bucketCol: String): DataFrame =
      if (!dedupResident) und
      else {
        val resident = spark.table(table)
          .join(broadcast(und.select(col(bucketCol)).distinct()),
            Seq(bucketCol), "left_semi")
        und.join(resident, Seq("u", "v"), "left_anti")
      }
    // bucket-aligned pre-repartition (numPartitions == nBuckets on the
    // bucket column -> partition index == bucket id): each bucket's batch
    // rows land as ONE appended file instead of one per (task, bucket)
    freshFor(byUTable, "u").repartition(nBuckets, col("u")).write
      .mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
      .bucketBy(nBuckets, "u").sortBy("u").saveAsTable(byUTable)
    freshFor(byVTable, "v").repartition(nBuckets, col("v")).write
      .mode(org.apache.spark.sql.SaveMode.Append).format("parquet")
      .bucketBy(nBuckets, "v").sortBy("v").saveAsTable(byVTable)
    freeCheckpoint(und)
  }

  // release a prior round's localCheckpoint blocks — see [[Checkpoints]]
  private def freeCheckpoint(df: DataFrame): Unit = Checkpoints.free(df)

  /** The exact distance-2 wedge MULTISET `(src, dst)` (src ≠ dst, one row
    * per wedge src → mid → dst) with the hot-midpoint full-square block
    * decomposition described on [[fofCensus]]. Each wedge appears exactly
    * once — a wedge meets in the single cell `(h(src) mod k, h(dst) mod
    * k)` — so both the distinct census and per-pair wedge COUNTS
    * (common-neighbor scores) read off it directly.
    */
  /** Row bound under which [[wedges]]' fast path broadcasts the incoming-
    * edge side of the wedge join instead of shuffling it: ~4M undirected
    * rows ≈ 100 MB hashed relation — inside guide §3.1's comfortable
    * broadcast range, far under the 8 GB hard cap. Overridable via
    * `spark.graft.wedgeBroadcastRows` (set 0 to force the shuffled path).
    */
  private def wedgeBroadcastRows(und: DataFrame): Long =
    und.sparkSession.conf.get("spark.graft.wedgeBroadcastRows", "4000000").toLong

  private def wedges(und: DataFrame, deg: DataFrame, hotCap: Int,
                     carryE2: Seq[String] = Nil): DataFrame = {
    // hubs are few by construction (at most 2m/cap nodes exceed cap)
    val hot = deg.filter(col("deg") > hotCap)
      .select(col("u").as("mid"), ceil(col("deg") / hotCap).cast("int").as("hk"))
    // EXPLICIT join-key repartition on both sides (same rationale as
    // [[coOccurrenceEdges]]): the inputs are |E|-sized but the join output
    // is Σdeg² wedges, so AQE's size-based broadcast/coalesce decisions
    // collapse parallelism exactly when the expansion makes parallelism
    // matter most. Pinned: 15 s → 2 s on the sf0.1 co-occurrence graph's
    // pair count.
    val p = und.sparkSession.sparkContext.defaultParallelism
    // One driver-side probe over the V-sized degree table decides the shape
    // (r13 optimization): max(deg) tells whether any midpoint needs the
    // block decomposition at all, sum(deg) = |und| tells whether the
    // incoming side fits a broadcast. No hot midpoint → every k is 1,
    // every cell is (0, 0), and the block grid degenerates to the plain
    // wedge join — run exactly that, skipping the per-row hash/explode and
    // hot-broadcast stages (Round9OpsSpec pins multiset equality of the
    // paths on hub graphs that DO trip the cap). Join strategy is chosen
    // DELIBERATELY (guide §3.1), not left to AQE: the join's OUTPUT is
    // Σdeg² rows, orders of magnitude over its inputs, and a sort-merge
    // fallback replays each duplicate-key group per probe row — measured
    // 22 s vs 3 s at sf0.1 when the e2 side (7–11 MB) straddled AQE's
    // 10 MB threshold. Small side → explicit broadcast; big side →
    // shuffled-hash hint (build each partition's hash table, never sort).
    // The probe is one eager aggregation job over the V-sized degree
    // table per wedges() call — accepted: it replaces an 8-stage guard
    // chain and its output also feeds the broadcast decision below.
    val degStats = deg.agg(max(col("deg")), sum(col("deg"))).head()
    val maxDeg = if (degStats.isNullAt(0)) 0L else degStats.getLong(0)
    val undRows = if (degStats.isNullAt(1)) 0L else degStats.getLong(1)
    if (maxDeg <= hotCap) {
      val e1 = und.select(col("u"), col("v")).repartition(p, col("v"))
      val e2 = und.select(col("u") +: col("v") +: carryE2.map(col): _*)
      // WIDTH-normalized bound (r14, ADVICE): carryE2 columns widen each
      // hashed row, so a raw row count under-prices the relation near the
      // bound — scale the row budget by (2 cols / actual cols) so the
      // BYTE size the conf calibrates (~100 MB at 4M 2-long rows) holds
      // for any carry width.
      val widthAdj = wedgeBroadcastRows(und) * 2 / (2 + carryE2.size)
      val e2Sized =
        if (undRows <= widthAdj) broadcast(e2)
        else e2.repartition(p, col("u")).hint("shuffle_hash")
      return e1.as("e1").join(e2Sized.as("e2"),
          col("e1.v") === col("e2.u") && col("e1.u") =!= col("e2.v"))
        .select(col("e1.u").as("src") +: col("e2.v").as("dst") +:
          carryE2.map(c => col(s"e2.$c")): _*)
    }
    val e1 = und.join(broadcast(hot), col("v") === col("mid"), "left")
      .withColumn("k", coalesce(col("hk"), lit(1)))
      .withColumn("gi", pmod(xxhash64(col("u")), col("k")).cast("int"))
      .select(col("u"), col("v"),
        explode(transform(sequence(lit(0), col("k") - 1),
          j => struct(col("gi").as("i"), j.cast("int").as("j")))).as("c"))
      .select(col("u"), col("v"), col("c.i").as("i"), col("c.j").as("j"))
      .repartition(p, col("v"), col("i"), col("j"))
    val e2 = und.join(broadcast(hot), col("u") === col("mid"), "left")
      .withColumn("k", coalesce(col("hk"), lit(1)))
      .withColumn("gj", pmod(xxhash64(col("v")), col("k")).cast("int"))
      .select(col("u") +: col("v") +:
        explode(transform(sequence(lit(0), col("k") - 1),
          i => struct(i.cast("int").as("i"), col("gj").as("j")))).as("c") +:
        carryE2.map(col): _*)
      .select(col("u") +: col("v") +: col("c.i").as("i") +: col("c.j").as("j") +:
        carryE2.map(col): _*)
      .repartition(p, col("u"), col("i"), col("j"))
    e1.as("e1").join(e2.as("e2"),
        col("e1.v") === col("e2.u") && col("e1.i") === col("e2.i") &&
          col("e1.j") === col("e2.j") && col("e1.u") =!= col("e2.v"))
      .select(col("e1.u").as("src") +: col("e2.v").as("dst") +:
        carryE2.map(c => col(s"e2.$c")): _*)
  }

  /** Common-neighbor link prediction: for every unordered non-edge pair at
    * distance 2, the number of shared neighbors — the classic
    * link-prediction baseline score (and the numerator of Adamic-Adar-
    * style refinements). Rides the same guarded wedge multiset as
    * [[fofCensus]]: one wedge per (src, mid, dst), so `count(*)` per pair
    * IS the common-neighbor count; hub midpoints are block-decomposed, so
    * no task owns more than ~cap² of a hub's wedges. The `src < dst`
    * restriction keeps one row per unordered pair; direct edges are
    * anti-joined away. Output: `(a, b, common)`.
    */
  def commonNeighbors(edges: DataFrame, hotCap: Int = 4096): DataFrame = {
    val und = undirected(edges)
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    cnFromWedges(wedges(und, deg, hotCap), edges)
  }

  /** [[commonNeighbors]] over the persisted bucketed layout — the stored
    * twin, same contract as [[fofCensusStored]] (zero exchanges below the
    * wedge join, output bit-identical to the built path, spec-pinned).
    */
  def commonNeighborsStored(undByV: DataFrame, undByU: DataFrame,
                            edges: DataFrame): DataFrame =
    cnFromWedges(wedgesStored(undByV, undByU), edges)

  private def cnFromWedges(wedgeMultiset: DataFrame, edges: DataFrame): DataFrame =
    wedgeMultiset
      .filter(col("src") < col("dst"))
      .groupBy(col("src").as("a"), col("dst").as("b"))
      .agg(count(lit(1)).as("common"))
      .join(edges.select(col("a"), col("b")), Seq("a", "b"), "left_anti")

  /** Adamic–Adar link prediction: per non-edge distance-2 pair,
    * Σ_mid 1/ln(deg(mid)) — the common-neighbor refinement that discounts
    * promiscuous midpoints (Adamic & Adar, Social Networks 2003). Each
    * per-midpoint term is rounded to integer micros BEFORE the sum (the
    * BM25 convention), so the per-pair score is an exact BIGINT sum both
    * engines agree on. The midpoint degree rides the e2 wedge side from a
    * single |E|-row join — never a join against the V-sized degree table
    * on the wedge axis. deg(mid) ≥ 2 for any wedge midpoint, so
    * ln(deg) > 0 always.
    */
  def adamicAdar(edges: DataFrame, hotCap: Int = 4096): DataFrame = {
    val und0 = undirected(edges)
    val deg = und0.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val und = und0.join(deg.select(col("u"), col("deg").as("dmid")), "u")
    wedges(und, deg, hotCap, carryE2 = Seq("dmid"))
      .filter(col("src") < col("dst"))
      .withColumn("aa",
        expr("CAST(round(1000000.0 / ln(CAST(dmid AS DOUBLE)), 0) AS BIGINT)"))
      .groupBy(col("src").as("a"), col("dst").as("b"))
      .agg(sum("aa").as("aa_micros"), count(lit(1)).as("common"))
      .join(edges.select(col("a"), col("b")), Seq("a", "b"), "left_anti")
  }

  /** k-core peel: drop nodes of degree < k, recompute degrees, repeat for
    * exactly `rounds` iterations — output the residual per-node degree.
    * The bounded-unroll twin of [[kcore]] (its hash gate): every round is
    * one map-combinable degree count + one broadcast-able semi-join per
    * side, and each round's survivor set shrinks monotonically, so the
    * iteration cost DECREASES — the scale shape of distributed k-core
    * (Montresor et al.-style peeling without per-node messaging).
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // materialize the input once: each round's plan references it several
    // times (degree side + both semi-join sides), and the edge builder
    // lineage (a co-occurrence pair join) must not replay per reference
    var e = edges.select(col("a"), col("b")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = undirected(e).groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("u"))
      val prev = e
      e = prev.join(keep.select(col("u").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("u").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint() // cut lineage: rounds otherwise stack join plans
      freeCheckpoint(prev) // eager checkpoint above no longer reads it
    }
    undirected(e).groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("deg_residual"))
  }

  /** k-core, iterate-until-fixpoint: peel rounds until no node drops.
    * The operator API behind the unrolled gate — [[kcorePeel]] with
    * `rounds` at the fixpoint equals this exactly (spec-pinned). Returns
    * the nodes of the k-core with their within-core degree (all ≥ k).
    */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int = 100): DataFrame = {
    var e = edges.select(col("a"), col("b")).localCheckpoint()
    var n = e.count()
    var it = 0
    var converged = false
    while (it < maxRounds && !converged) {
      val deg = undirected(e).groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("u"))
      val next = e.join(keep.select(col("u").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("u").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
      val m = next.count()
      converged = m == n
      n = m
      freeCheckpoint(e)
      e = next
      it += 1
    }
    require(converged, s"k-core did not converge in $maxRounds rounds")
    undirected(e).groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("deg_residual"))
  }

  /** PageRank, iterate-until-converged — the operator API behind the
    * unrolled hash gate (which is exactly `pagerank(edges, maxIters = 3,
    * tolMicros = 0)`). Ranks in EXACT integer micros, the gate's
    * convention: r'(v) = 0.15 + 0.85 · Σ_u c(u,v)·r(u)/W(u), every
    * division a truncating `div` over positive integers so the fixpoint
    * is deterministic and engine-portable.
    *
    * Input: weighted directed edges `(src, dst, c)`. Scale shape — two
    * regimes, chosen by one node count up front:
    *
    *  - `|V| <= broadcastNodeLimit`: the rank and out-weight vectors
    *    broadcast, each iteration is one broadcast-join + keyed sum and
    *    the edge table is never shuffled. The fast path for bounded node
    *    axes (event types, communities, shards).
    *  - `|V| > broadcastNodeLimit`: a billion-node rank vector cannot
    *    live on the driver, so the update becomes a SHUFFLE join — the
    *    (wout-annotated) edge table is hash-partitioned on `src` ONCE and
    *    checkpointed; each iteration then shuffles only the V-row rank
    *    vector to meet it (the edge side reuses its pinned partitioning),
    *    followed by the same keyed sum. Identical arithmetic, identical
    *    output (spec-pinned); per-iteration cost O(V) shuffle + O(E)
    *    map-side aggregate instead of O(V) broadcast.
    *
    * Stops when the total absolute rank movement drops to `tolMicros` or
    * below, or after `maxIters`; each convergence probe is one scalar
    * aggregate of the rank vector.
    *
    * `knownNodeCount`: callers that already know their node axis (a
    * bounded category axis, a maintained node table) pass it to skip the
    * per-call regime probe AND the eager node-set checkpoint — the fixed
    * overhead that dominates at gate scale, where the distinct is cheap
    * to replay. The automatic probe remains the default; output is
    * identical either way (spec-pinned).
    */
  def pagerank(edges: DataFrame, maxIters: Int = 50,
               tolMicros: Long = 100L,
               broadcastNodeLimit: Long = 2_000_000L,
               knownNodeCount: Option[Long] = None): DataFrame = {
    val wout = edges.groupBy("src").agg(sum("c").as("wout"))
    val nodes0 = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
    val nodes =
      if (knownNodeCount.isDefined) nodes0
      else nodes0.localCheckpoint() // referenced every iteration: build once
    val useBroadcast =
      knownNodeCount.getOrElse(nodes.count()) <= broadcastNodeLimit
    // the shuffle regime pays the edge-side partitioning once, here
    val edgesW =
      if (useBroadcast) null
      else edges.join(wout, "src")
        .repartition(edges.sparkSession.sparkContext.defaultParallelism,
          col("src"))
        .localCheckpoint()
    var r = nodes.withColumn("r", lit(200000L))
    var it = 0
    var moved = Long.MaxValue
    while (it < maxIters && moved > tolMicros) {
      val rSrc = r.select(col("node").as("src"), col("r"))
      val contrib =
        (if (useBroadcast)
           edges.join(broadcast(wout), "src").join(broadcast(rSrc), "src")
         else edgesW.join(rSrc, "src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("c * r div wout")).as("sc"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(30000L) + expr("850000 * coalesce(sc, 0L) div 1000000")).as("r"))
        .localCheckpoint() // cut the per-iteration lineage growth
      moved = next.join(r.withColumnRenamed("r", "pr"), "node")
        .agg(sum(abs(col("r") - col("pr"))).as("m"))
        .head().getLong(0)
      freeCheckpoint(r)
      r = next
      it += 1
    }
    if (edgesW != null) freeCheckpoint(edgesW)
    // after >= 1 iteration r's checkpoint cut its lineage, so the node
    // set is no longer read by the result — release it (only if we
    // created it); with zero iterations the result IS a projection over
    // the node checkpoint and freeing it would destroy the output
    if (knownNodeCount.isEmpty && it > 0) freeCheckpoint(nodes)
    val out = r.select(col("node"), col("r").as("pagerank_micros"))
    // the result frame still reads the final checkpoint: hand it back
    // as-is (its blocks are released by the ContextCleaner with the frame)
    out
  }

  /** Synchronous label propagation (Raghavan et al., Phys. Rev. E 2007),
    * `rounds` bounded-unroll: every node starts labeled by itself; each
    * round it adopts the label held by the most neighbors, ties broken by
    * the SMALLEST label — the deterministic argmax (max count, min label)
    * that makes the community assignment engine-portable (the paper's
    * random tie-break is not reproducible across engines).
    *
    * Scale shape per round: one |E|-row join of the undirected edge list
    * against the V-sized label vector (shuffle keyed on the neighbor id —
    * output is exactly |E| rows, no expansion, so per-task concentration
    * is bounded by hub degree, which AQE skew split handles), then two
    * map-combinable aggregations: (node, label) counts collapse map-side
    * to the label-diversity of each neighborhood, and the argmax is a
    * max + min pair on that collapsed axis. No windows, no V×V work.
    * Input: undirected distinct edges `(a, b)`. Output: `(node, label)`.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val und = undirected(edges).localCheckpoint()
    var labels = und.select(col("u").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to rounds) {
      val msgs = und
        .join(labels.select(col("node").as("v"), col("lab")), "v")
        .groupBy(col("u").as("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val best = msgs.groupBy("node").agg(max("c").as("cmax"))
      val prev = labels
      labels = msgs.join(best, "node")
        .filter(col("c") === col("cmax"))
        .groupBy("node").agg(min("lab").as("lab"))
        .localCheckpoint() // cut lineage: rounds otherwise stack plans
      freeCheckpoint(prev) // eager checkpoint above no longer reads it
    }
    labels
  }

  /** Label propagation, iterate-until-stable — the operator API behind
    * the unrolled gate: rounds continue until no node changes label (or
    * `maxRounds`). Each convergence probe is one scalar count of the
    * changed-label join, the same cheap-probe convention as [[kcore]] /
    * [[pagerank]].
    */
  def labelPropagationConverged(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val und = undirected(edges).localCheckpoint()
    var labels = und.select(col("u").as("node")).distinct()
      .withColumn("lab", col("node"))
      .localCheckpoint()
    var it = 0
    var changed = Long.MaxValue
    while (it < maxRounds && changed > 0) {
      val msgs = und
        .join(labels.select(col("node").as("v"), col("lab")), "v")
        .groupBy(col("u").as("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val best = msgs.groupBy("node").agg(max("c").as("cmax"))
      val next = msgs.join(best, "node")
        .filter(col("c") === col("cmax"))
        .groupBy("node").agg(min("lab").as("lab"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("lab", "prev"), "node")
        .filter(col("lab") =!= col("prev")).count()
      freeCheckpoint(labels)
      labels = next
      it += 1
    }
    labels
  }
}
