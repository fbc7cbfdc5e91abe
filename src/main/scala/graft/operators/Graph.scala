package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Iterative graph analytics as relational fixpoint rounds (joins +
  * aggregations per iteration — the same shape as
  * [[Dedup.clusterNearDups]]'s connected components).
  *
  * Cross-engine determinism: per-iteration neighbor contributions are
  * quantized to Q30 fixed point BEFORE summation — `floor(x · 2³⁰)` of the
  * same IEEE double is exact on any engine and integer sums are
  * order-independent across partitions, so the rank vector after any number
  * of iterations is bit-identical to an unrolled SQL evaluation (no
  * "approximately equal" tolerance needed in the oracle).
  *
  * Scale shape: each iteration is one join of the edge list against the
  * |V|-sized rank frame (broadcast when small, shuffle on `src` otherwise —
  * the edge list's partitioning on `src` is reused across iterations) plus
  * one `dst`-keyed partial+final aggregation. Work per iteration is O(|E|),
  * state is O(|V|); nothing is ever collected to the driver except the
  * node count.
  */
object Graph {

  private val Q = 1073741824.0 // 2^30

  /** Materialize `df` into a persisted Row RDD and rebuild a frame over it:
    * lineage truncation (like localCheckpoint) but with an explicit handle
    * to free the storage — a localCheckpoint's blocks can only be reclaimed
    * by driver GC, which pins iterations × |V| rows for an unbounded time
    * in long sweeps. Row round-trips preserve long/double bit-exactly. */
  private def pin(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
    val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = df.sparkSession.createDataFrame(rdd, df.schema)
    out.count() // materialize now, under the caller's control
    (out, rdd)
  }

  /** Undirected expansion of a bipartite (a, b) edge set, with the two
    * vertex classes mapped into one disjoint long id space (2a / 2b+1).
    * One pass: each distinct pair explodes into its two directions —
    * NOT a self-union, whose two branches would each carry a copy of the
    * (join + distinct) subplan feeding this. */
  def undirectedBipartite(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    pairs.select((col(aCol) * 2).as("a"), (col(bCol) * 2 + 1).as("b"))
      .distinct()
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** PageRank with damping `d` over a pre-expanded directed edge list.
    * Every vertex must appear as a `src` — ENFORCED with one up-front
    * anti-join probe, because a violation is not an error message
    * downstream, it is silently leaked rank mass (sink vertices absorb and
    * never redistribute; vertices with no in-edges vanish from the rank
    * frame after round 1). True for undirected expansions — the intended
    * input; for a general digraph use [[pageRankDigraph]], which carries
    * the full vertex set and redistributes dangling mass per round.
    *
    * Returns (id, rank, deg) — `rank` is the value after `iterations`
    * rounds from the uniform start, bit-reproducible per the Q30 contract.
    *
    * `pinEvery` controls how often the rank frame is materialized to cut
    * lineage: rounds in between stay ONE composed plan — the |V|-row rank
    * frames broadcast level by level inside a single job, so a short sweep
    * (the common case) costs one action instead of a job + Row-RDD
    * round-trip + fresh codegen per round. Unbounded composition is not an
    * option either — plan depth grows per round and analysis/codegen time
    * with it — so every `pinEvery` rounds the frame is pinned and the chain
    * restarts from the materialized rows.
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      maxBroadcastNodes: Long = 10000000L, pinEvery: Int = 8): DataFrame = {
    require(pinEvery > 0, "pinEvery must be positive")
    // Two cached frames (r14 restructure; previously three): the raw edge
    // list and the |V|-row degree frame. ONE aggregation derives degree AND
    // the dangling probe — each edge contributes (src, 1) and (dst, 0), so
    // a zero out-degree sum is exactly "appears as dst, never as src", and
    // the probe reads |V| cached rows instead of anti-joining the |E|-row
    // edge list (guide §2.4: operations keyed the same way share one
    // shuffle). Rank frames are |V| rows: below maxBroadcastNodes they
    // broadcast, so the cached edge list never re-shuffles across rounds;
    // past the bound the joins fall back to src-keyed shuffles. All caches
    // are freed before returning; the returned frame's lineage is cut.
    val raw = edges.cache()
    val deg = raw.select(explode(array(
        struct(col("src").as("id"), lit(1L).as("o")),
        struct(col("dst").as("id"), lit(0L).as("o")))).as("v"))
      .select(col("v.id").as("id"), col("v.o").as("o"))
      .groupBy("id").agg(sum(col("o")).as("deg")).cache()
    try {
      // |V| — the one driver-side scalar (needed inside the next literal)
      val n = deg.count().toDouble
      if (!deg.where(col("deg") === 0).isEmpty)
        throw new IllegalArgumentException(
          "pageRank input has dangling vertices (appear as dst, never as " +
            "src) — their rank mass would silently leak; use " +
            "pageRankDigraph for general digraphs")
      val base = (1.0 - damping) / n
      val bcast = n <= maxBroadcastNodes.toDouble
      def maybeBcast(df: DataFrame) = if (bcast) broadcast(df) else df
      // ranks CARRIES deg (id, rank, deg): the per-round contribution
      // floor((rank/deg)·Q) is a pure vertex function, so it is computed
      // once per VERTEX inside the |V|-row broadcast projection instead of
      // once per EDGE (guide §2.3: shuffle/broadcast metadata, not
      // payloads) — which also retires the old (edges ⋈ degree) |E|-row
      // 3-column cache entirely and the final deg re-join (the frame
      // already has deg). Bit-identical output: the floor expression and
      // its inputs are unchanged, only the frame evaluating it moved.
      var ranks = deg.select(col("id"), lit(1.0 / n).as("rank"), col("deg"))
      var pinned: Option[org.apache.spark.rdd.RDD[Row]] = None
      for (i <- 1 to iterations) {
        val shares = ranks.select(col("id").as("sid"),
          floor(col("rank") / col("deg") * lit(Q)).as("q"))
        val next = raw.join(maybeBcast(shares), raw("src") === col("sid"))
          .groupBy(col("dst")).agg(sum(col("q")).as("sq"))
          .select(col("dst").as("id"),
            (lit(base) +
              lit(damping) * (col("sq").cast("double") / lit(Q)))
              .as("rank"))
          .join(maybeBcast(deg), Seq("id"))
          .select(col("id"), col("rank"), col("deg"))
        if (i % pinEvery == 0 && i < iterations) {
          val (p, handle) = pin(next)
          pinned.foreach(_.unpersist(false)) // previous pin, unreferenced
          pinned = Some(handle)
          ranks = p
        } else ranks = next
      }
      // the returned frame stays pinned (one |V|-row block set) so the
      // caller never re-derives the freed caches below; it is released
      // by the ContextCleaner once the caller drops the frame
      val (result, _) = pin(ranks)
      pinned.foreach(_.unpersist(false))
      result
    } finally { deg.unpersist(); raw.unpersist() }
  }

  /** PageRank over an ARBITRARY digraph: sinks (no out-edges) and pure
    * sources (no in-edges) are both first-class. Per round, the rank mass
    * sitting on sinks — which [[pageRank]] would silently leak — is summed
    * (Q30-quantized, so the sum is an order-independent integer) and
    * redistributed uniformly:
    *
    *   rank'(v) = (1−d)/n + d·(Σ_{u→v} ⌊rank(u)/deg(u)·2³⁰⌋)/2³⁰
    *                      + d·(Σ_{sink u} ⌊rank(u)·2³⁰⌋)/2³⁰/n
    *
    * IEEE evaluation order is pinned left-to-right exactly as written, so
    * the result is bit-identical to the unrolled SQL oracle, like
    * [[pageRank]]. The vertex set is src ∪ dst; vertices with no in-edges
    * keep their base + dangling share (a LEFT join against the vertex
    * frame, where pageRank's inner groupBy would drop them).
    *
    * Scale shape: per round, one edge-list join against the broadcast-or-
    * shuffled |V|-row rank frame + one dst-keyed aggregation + one 1-row
    * dangling aggregate cross-joined back (broadcast). The rank frame is
    * referenced twice per round (contributions + dangling sum), so it is
    * materialized (pinned) EVERY round — two reads of |V| persisted rows,
    * never a recompute, and lineage stays one round deep. */
  def pageRankDigraph(edges: DataFrame, iterations: Int, damping: Double = 0.85,
      maxBroadcastNodes: Long = 10000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val raw = edges.cache()
    try {
      val outdeg = raw.groupBy("src").agg(count(lit(1)).as("deg"))
      // full vertex set with out-degree, 0 for sinks — the per-round
      // left-join spine and the dangling filter both read it
      val (vdeg, vdegHandle) = pin(
        raw.select(col("src").as("id"))
          .union(raw.select(col("dst").as("id"))).distinct()
          .join(outdeg.select(col("src").as("id"), col("deg")), Seq("id"), "left")
          .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg")))
      try {
        val n = vdeg.count().toDouble
        val base = (1.0 - damping) / n
        val bcast = n <= maxBroadcastNodes.toDouble
        def maybeBcast(df: DataFrame) = if (bcast) broadcast(df) else df
        var ranks = vdeg.select(col("id"), lit(1.0 / n).as("rank"), col("deg"))
        var pinned: Option[org.apache.spark.rdd.RDD[Row]] = None
        for (_ <- 1 to iterations) {
          val dang = ranks.where(col("deg") === 0)
            .agg(coalesce(sum(floor(col("rank") * lit(Q))), lit(0L)).as("dq"))
          // per-VERTEX share, computed on the |V|-row frame before the
          // broadcast instead of once per edge (r14, same move as
          // pageRank): sinks (deg = 0) never match the src join, so their
          // guarded 0 share is dropped rows either way — the when() only
          // keeps Infinity out of the projected column. Bit-identical for
          // every surviving row (same floor over the same inputs).
          val r = ranks.select(col("id").as("rid"),
            when(col("deg") > 0,
              floor(col("rank") / col("deg") * lit(Q)))
              .otherwise(lit(0L)).as("q"))
          val sums = raw.join(maybeBcast(r), raw("src") === col("rid"))
            .select(col("dst"), col("q"))
            .groupBy("dst").agg(sum(col("q")).as("sq"))
          val next = vdeg.join(sums, vdeg("id") === sums("dst"), "left")
            .crossJoin(broadcast(dang))
            .select(vdeg("id"),
              (lit(base)
                + lit(damping) *
                  (coalesce(col("sq"), lit(0L)).cast("double") / lit(Q))
                + lit(damping) * (col("dq").cast("double") / lit(Q)) / lit(n))
                .as("rank"),
              vdeg("deg"))
          val (p, handle) = pin(next)
          pinned.foreach(_.unpersist(false))
          pinned = Some(handle)
          ranks = p
        }
        ranks // pinned + lineage-cut; freed by ContextCleaner when dropped
      } finally vdegHandle.unpersist(false)
    } finally raw.unpersist()
  }
}
