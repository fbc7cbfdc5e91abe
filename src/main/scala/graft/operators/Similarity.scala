package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — the corpus
  * streams through one codegen'd stage, no shuffle of the corpus).
  * Scale path: random-hyperplane LSH bucketing — each corpus vector lands in
  * one bucket per table, candidates are the bucket-join, so the 100 TB corpus
  * is never crossed with itself. Hyperplanes are deterministic (hash-seeded),
  * not RNG-dependent, for reproducibility.
  */
object Similarity {

  // native element-wise Cast, NOT transform(_.cast): the higher-order
  // lambda is CodegenFallback and forces the consuming projection
  // interpreted; Cast on array<float> -> array<double> is codegen'd and
  // value-identical (float upcast is exact, nulls preserved)
  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. `queries` is expected to be small → broadcast; corpus-side scan
    * stays shuffle-free until the final per-query top-k (tiny). */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("nbr_id"), asDouble(col(corpusVec)).as("cvec"))
      .withColumn("cnrm", sqrt(VectorExpressions.sqNormNative(col("cvec"))))
    val q = queries.select(col(queryId).as("query_id"), asDouble(col(queryVec)).as("qvec"))
      .withColumn("qnrm", sqrt(VectorExpressions.sqNormNative(col("qvec"))))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("nbr_id"),
        cosineFromNorms(VectorExpressions.dotNative(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cosine"))
  }

  /** Cosine top-k of the corpus against a SINGLE query vector — the serving
    * shape for one query. Unlike [[bruteForceTopK]]'s per-query window
    * (which sorts each query's full candidate set inside one partition),
    * the bounded orderBy+limit plans as TakeOrderedAndProject: per-partition
    * top-k then a k-row merge, so no task ever sorts the corpus. The rank
    * window then runs over the ALREADY-BOUNDED k rows. Same cosine
    * expression as bruteForceTopK, so the two agree row-for-row on their
    * common prefix. `query` must be exactly one row.
    *
    * EAGER: composing this operator runs one bounded Spark job (collects at
    * most 2 query rows) to enforce the one-row contract; the collected
    * vector is then inlined as a literal, so the guarded row IS the joined
    * row — a non-deterministic query source cannot pass the guard with one
    * row and join a different one, and the query side is never
    * re-evaluated. */
  def topKToQuery(corpus: DataFrame, corpusId: String, corpusVec: String,
                  query: DataFrame, queryVec: String, k: Int): DataFrame = {
    val top = scoredToQuery(corpus, corpusId, corpusVec, query, queryVec)
      .orderBy(col("cosine").desc, col("nbr_id").asc)
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("nbr_id").asc)).cast("long"))
      .select(col("rank"), col("nbr_id"), col("cosine"))
  }

  /** [[topKToQuery]] with the ranking quantized to integer micro-units:
    * ranks by `floor(cosine · 1e6)` (bigint `cos_u6`) with id tiebreak, the
    * same exact-integer discipline as bm25's score_u6 / rrfFuse's rrf_u9.
    * Cross-engine rank parity then needs only ~1e-6 cosine agreement, not
    * bit-equality — near-tied cosines quantize equal and the deterministic
    * id tiebreak decides on both engines. Output (rank, nbr_id, cos_u6). */
  def topKToQueryU6(corpus: DataFrame, corpusId: String, corpusVec: String,
                    query: DataFrame, queryVec: String, k: Int): DataFrame = {
    val top = scoredToQuery(corpus, corpusId, corpusVec, query, queryVec)
      .select(col("nbr_id"),
        floor(col("cosine") * lit(1000000.0)).cast("long").as("cos_u6"))
      .orderBy(col("cos_u6").desc, col("nbr_id").asc)
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("cos_u6").desc, col("nbr_id").asc)).cast("long"))
      .select(col("rank"), col("nbr_id"), col("cos_u6"))
  }

  /** Shared single-query scoring core: guard + literal-inline + broadcast
    * cross join → (nbr_id, cosine), unbounded (callers bound it). */
  private def scoredToQuery(corpus: DataFrame, corpusId: String,
                            corpusVec: String, query: DataFrame,
                            queryVec: String): DataFrame = {
    // a >1-row query side would interleave cosines from different queries
    // into one meaningless ranking with no error — fail fast instead. The
    // guard job is bounded (collects at most 2 rows).
    val qRows = query.select(asDouble(col(queryVec)).as("qvec"))
      .limit(2).collect()
    require(qRows.length == 1,
      s"query must be exactly one row, got ${qRows.length} " +
        "(use bruteForceTopK for multi-query ranking)")
    val qvec: Seq[Double] = qRows.head.getSeq[Double](0)
    require(qvec != null, "query vector must not be null")
    val c = corpus.select(col(corpusId).as("nbr_id"), asDouble(col(corpusVec)).as("cvec"))
      .withColumn("cnrm", sqrt(VectorExpressions.sqNormNative(col("cvec"))))
    val q = corpus.sparkSession.range(1)
      .select(typedLit(qvec).as("qvec"))
      .withColumn("qnrm", sqrt(VectorExpressions.sqNormNative(col("qvec"))))
    c.crossJoin(broadcast(q))
      .select(col("nbr_id"),
        cosineFromNorms(VectorExpressions.dotNative(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("cosine"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of named,
    * ALREADY-BOUNDED candidate lists: each input carries (idCol, rankCol)
    * with ranks 1..k, and the fused score sums the exact integer
    * `10^9 div (rrfK + rank)` over the lists an id appears in (absence
    * contributes 0 — the standard RRF treatment). Output:
    * (idCol, rrf_u9, <name>_rank...). Integer div, never double division,
    * so the score is bit-exact and order-free. Fusion is O(k · lists):
    * full-outer joins of k-row frames — the corpus-scale work happened in
    * the component rankers.
    *
    * CONTRACT: each list must carry ONE row per id with a positive rank
    * (row_number semantics; rank()-style ties would fan out the join
    * chain into duplicated fused rows, multiplicatively with 3+ lists). */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              rankCol: String = "rank", rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(rrfK > 0, s"rrfK must be positive, got $rrfK " +
      "(a non-positive constant can hit division by zero -> silent null)")
    require(lists.map(_._1).distinct == lists.map(_._1),
      "list names must be distinct")
    require(lists.forall(_._1.matches("[A-Za-z][A-Za-z0-9_]*")),
      "list names must be identifiers (they become <name>_rank columns)")
    val named = lists.map { case (n, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"${n}_rank")) }
    val joined = named.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = lists.map { case (n, _) =>
      expr(s"coalesce(1000000000L div (${rrfK}L + ${n}_rank), 0L)") }
      .reduce(_ + _)
    joined.withColumn("rrf_u9", score)
      .select(col(idCol) +: col("rrf_u9") +:
        lists.map { case (n, _) => col(s"${n}_rank") }: _*)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a value in [-0.5, 0.5) derived from md5 — identical across engines.
    * Exposed package-wide so the DuckDB oracle SQL can embed the exact same
    * constants (Double.toString round-trips bit-exactly through the SQL
    * parser). */
  private[graft] def planeComponent(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane_${p}_$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2.0, 60.0)) - 0.5
  }

  /** Sign-bucket signature: for each of `nPlanes` deterministic hyperplanes,
    * the sign bit of vec · plane. Vectors in the same bucket are ANN
    * candidates. */
  def lshBucket(vec: Column, dims: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = array((0 until dims).map(d => lit(planeComponent(p, d))): _*)
      when(dotProduct(vec, plane) >= 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Deterministic coarse centroids: the `nLists` corpus vectors with the
    * smallest hash60(prefix#id) — a seedless uniform sample of the corpus,
    * reproducible on any engine (no k-means RNG). The selection is a
    * distributed top-k (TakeOrderedAndProject), never a global sort or
    * single-partition window; the winners are collected (nLists rows) and
    * inlined as literals by [[nearestCentroids]]. */
  private[graft] def deterministicCentroids(corpus: DataFrame, idC: String,
      vecC: String, nLists: Int, prefix: String): Array[(Long, Array[Double])] =
    corpus
      .orderBy(hash60(concat(lit(s"$prefix#"), col(idC).cast("string"))).asc,
        col(idC).asc)
      .limit(nLists)
      .select(col(idC).cast("long"), asDouble(col(vecC)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Candidate list for a vector against literal centroids: (negated cosine,
    * list_id) structs sorted ascending = cosine desc with ties to the lower
    * list id — the same argmax rule as a row_number over (cosine DESC,
    * list_id ASC). A NaN cosine (zero-norm vector or centroid) is mapped to
    * -infinity FIRST: array_sort would rank a NaN-keyed struct last, but the
    * oracle's ORDER BY cosine DESC ranks NaN first (NaN sorts largest on
    * both engines), so without the guard a zero-norm centroid would capture
    * every row on one engine and none on the other. With the guard both
    * engines deterministically rank zero-norm candidates worst.
    *
    * `vecNorm` is the caller's precomputed `sqrt(sqNorm(vec))` column —
    * shared across all nCents candidates instead of re-derived per
    * candidate; each centroid's norm folds to a Scala constant (same
    * left-to-right sum as SqNormExpr, so the cosine stays bit-identical to
    * `cosineSimNative`/`list_cosine_similarity`). Keeps the argmax
    * expression tree ~3× smaller — Janino compile time is the dominant cost
    * of wide literal-centroid plans, not row throughput. */
  private[graft] def nearestCentroids(vec: Column, vecNorm: Column,
      cents: Array[(Long, Array[Double])]): Column =
    array_sort(array(cents.toIndexedSeq.map { case (id, arr) =>
      val centNorm = math.sqrt(arr.map(x => x * x).sum)
      val cos = cosineFromNorms(VectorExpressions.dotNative(vec, typedLit(arr)),
        vecNorm, lit(centNorm))
      val guarded = when(isnan(cos), lit(Double.NegativeInfinity)).otherwise(cos)
      struct((-guarded).as("nc"), lit(id).as("list_id"))
    }: _*))

  /** IVF-style ANN: corpus vectors are assigned to their nearest of `nLists`
    * coarse centroids (deterministic: the centroids are the corpus vectors
    * with the smallest md5-derived id hash — a reproducible pseudo-random
    * sample, no k-means RNG); a query probes its `nProbe` closest lists and
    * ranks exact cosine inside them only. The inverted-list join bounds work
    * to |corpus|/nLists · nProbe per query — the scale path when sign-bucket
    * LSH recall is insufficient. */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, nLists: Int, nProbe: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("nbr_id"), asDouble(col(corpusVec)).as("cvec"))
    val q = queries.select(col(queryId).as("query_id"), asDouble(col(queryVec)).as("qvec"))
    // centroids inlined as literals so list assignment below is a pure
    // per-row expression — no crossJoin, no Exchange, no Window ever touches
    // the corpus side
    val cents = deterministicCentroids(c, "nbr_id", "cvec", nLists, "ivf")
    // empty corpus -> no centroids -> an empty zero-element array() would
    // type as array<void> and fail analysis; the result is empty either way
    if (cents.isEmpty)
      return q.limit(0).crossJoin(c.limit(0).select(col("nbr_id")))
        .select(col("query_id"), lit(0L).as("rank"), col("nbr_id"),
          lit(0.0).as("cosine"))
    // corpus → nearest list: element 1 of the sorted candidate array; the
    // per-vector norm is computed once and shared by the argmax AND the
    // exact scoring join below (norms per row, not per pair)
    val assigned = c
      .withColumn("cnrm", sqrt(VectorExpressions.sqNormNative(col("cvec"))))
      .withColumn("list_id", graft.functions.VectorExpressions
        .nearestCentroidIdNative(col("cvec"), col("cnrm"), cents))
      .select(col("nbr_id"), col("cvec"), col("cnrm"), col("list_id"))
    // query → nProbe nearest lists: first nProbe of the sorted candidates
    val probes = q
      .withColumn("qnrm", sqrt(VectorExpressions.sqNormNative(col("qvec"))))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        explode(slice(nearestCentroids(col("qvec"), col("qnrm"), cents),
          1, nProbe)).as("_p"))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        col("_p.list_id").as("list_id"))
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .select(col("query_id"), col("nbr_id"),
        cosineFromNorms(VectorExpressions.dotNative(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cosine"))
  }

  /** IVF INDEX ARTIFACT — the build-once face of [[ivfTopK]] for corpora
    * queried many times (at 100 TB nobody re-derives centroids and
    * re-assigns the corpus per query batch; the index is a persisted
    * table). Returns two plain DataFrames a pipeline persists as parquet:
    * centroids (list_id, centroid) — nLists rows — and assigned
    * (nbr_id, cvec, cnrm, list_id) — one row per corpus vector, norms
    * precomputed. Write `assigned` with `.partitionBy("list_id")` and
    * [[ivfTopKFromIndex]]'s probe filter prunes to nProbe/nLists of the
    * files before any I/O (IvfIndexSpec asserts the pruned scan).
    * Arithmetic is bit-identical to [[ivfTopK]] (same deterministic
    * centroid rule, same NaN argmax guard), so querying the artifact
    * reproduces ivfTopK exactly — the ann_ivf_index catalog entry is
    * gated by the ann_ivf oracle verbatim. */
  def buildIvfIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
                    nLists: Int): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(corpusId).as("nbr_id"),
      asDouble(col(corpusVec)).as("cvec"))
    val cents = deterministicCentroids(c, "nbr_id", "cvec", nLists, "ivf")
    val centDf = cents.toIndexedSeq
      .map { case (id, arr) => (id, arr.toSeq) }.toDF("list_id", "centroid")
    if (cents.isEmpty)
      return (centDf, c.limit(0).select(col("nbr_id"), col("cvec"),
        lit(0.0).as("cnrm"), lit(0L).as("list_id")))
    val assigned = c
      .withColumn("cnrm", sqrt(VectorExpressions.sqNormNative(col("cvec"))))
      .withColumn("list_id", graft.functions.VectorExpressions
        .nearestCentroidIdNative(col("cvec"), col("cnrm"), cents))
      .select(col("nbr_id"), col("cvec"), col("cnrm"), col("list_id"))
    (centDf, assigned)
  }

  /** Query a [[buildIvfIndex]] artifact (possibly read back from parquet).
    * The probe rows (query, norm, probed list_id) are computed ONCE and
    * collected to the driver — bounded by |queries| × nProbe, i.e. the
    * broadcast side of the join, never the corpus — then the distinct list
    * ids are pushed as a LITERAL isin filter on `assigned` before the probe
    * join, so a list_id-partitioned artifact prunes at the file level:
    * query cost is nProbe/nLists of the index regardless of corpus size.
    * Output (query_id, rank, nbr_id, cosine), bit-identical to [[ivfTopK]]
    * on the same corpus and parameters. */
  def ivfTopKFromIndex(centroids: DataFrame, assigned: DataFrame,
                       queries: DataFrame, queryId: String, queryVec: String,
                       k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(col(queryId).as("query_id"),
      asDouble(col(queryVec)).as("qvec"))
    val cents = centroids
      .select(col("list_id").cast("long"), asDouble(col("centroid")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1) // parquet read-back order is arbitrary; pin it
    if (cents.isEmpty)
      return q.limit(0).crossJoin(assigned.limit(0).select(col("nbr_id")))
        .select(col("query_id"), lit(0L).as("rank"), col("nbr_id"),
          lit(0.0).as("cosine"))
    val probesPlan = q
      .withColumn("qnrm", sqrt(VectorExpressions.sqNormNative(col("qvec"))))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        explode(slice(nearestCentroids(col("qvec"), col("qnrm"), cents),
          1, nProbe)).as("_p"))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        col("_p.list_id").as("list_id"))
    // Evaluate the probe subplan (queries scan + the wide nearestCentroids
    // literal argmax) EXACTLY ONCE: the probe rows are the broadcast side of
    // the join, so collecting them (|queries| × nProbe rows) costs no more
    // than the broadcast itself, and both the literal isin pruning filter
    // and the join side derive from the same collected array.
    val spark = queries.sparkSession
    val probeRows = probesPlan.collect()
    val probedIds = probeRows.iterator.map(_.getAs[Long]("list_id"))
      .toSet.toIndexedSeq.sorted
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probesPlan.schema)
    val a = assigned.select(col("nbr_id"), col("cvec"),
        col("cnrm").cast("double").as("cnrm"),
        col("list_id").cast("long").as("list_id"))
      .where(col("list_id").isin(probedIds.map(Long.box): _*))
    val scored = a.join(broadcast(probes), Seq("list_id"))
      .select(col("query_id"), col("nbr_id"),
        cosineFromNorms(VectorExpressions.dotNative(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cosine"))
  }

  /** Streaming ANN SERVING face of [[ivfTopK]]: the corpus is indexed once
    * (literal centroids, per-row list assignment — identical arithmetic to
    * the batch operator) and every ARRIVING query row explodes into its
    * `nProbe` probed lists and hash-joins the static bucketed corpus — a
    * STATELESS stream-static join (no watermark, no state store), i.e. the
    * online vector-search ingest shape: index residency is the static
    * side's problem, per-query work is bounded by |corpus|/nLists·nProbe.
    * Returns the scored candidate stream (query_id, nbr_id, cosine);
    * ranking happens downstream (a bounded TopK aggregate or a batch
    * readout), because per-group rank windows do not exist on unbounded
    * streams. Scores are bit-identical to [[ivfTopK]]'s by construction —
    * the catalog entry's oracle is the batch SQL verbatim. */
  def ivfScoreStream(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queryStream: DataFrame, queryId: String,
                     queryVec: String, nLists: Int, nProbe: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("nbr_id"),
      asDouble(col(corpusVec)).as("cvec"))
    val q = queryStream.select(col(queryId).as("query_id"),
      asDouble(col(queryVec)).as("qvec"))
    val cents = deterministicCentroids(c, "nbr_id", "cvec", nLists, "ivf")
    require(cents.nonEmpty, "empty corpus cannot serve ANN queries")
    val assigned = c
      .withColumn("cnrm", sqrt(VectorExpressions.sqNormNative(col("cvec"))))
      .withColumn("list_id", graft.functions.VectorExpressions
        .nearestCentroidIdNative(col("cvec"), col("cnrm"), cents))
      .select(col("nbr_id"), col("cvec"), col("cnrm"), col("list_id"))
    val probes = q
      .withColumn("qnrm", sqrt(VectorExpressions.sqNormNative(col("qvec"))))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        explode(slice(nearestCentroids(col("qvec"), col("qnrm"), cents),
          1, nProbe)).as("_p"))
      .select(col("query_id"), col("qvec"), col("qnrm"),
        col("_p.list_id").as("list_id"))
    probes.join(assigned, Seq("list_id"))
      .select(col("query_id"), col("nbr_id"),
        cosineFromNorms(VectorExpressions.dotNative(col("qvec"), col("cvec")),
          col("qnrm"), col("cnrm")).as("cosine"))
  }

  /** Product-quantization ANN (Jegou, Douze & Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)): each
    * corpus vector is compressed to `m` sub-codes — per subspace, the index
    * of the nearest of `ks` codebook entries — and queries rank corpus
    * candidates by exact cosine against the RECONSTRUCTED (quantized)
    * vectors. The stored representation shrinks from dims doubles to m
    * small ints per vector (64x at dims=64/m=8/ks<=256), which is the
    * operator's 100 TB value: the scan side reads code columns, never raw
    * vectors, and the codebook is a literal inlined into the plan (the
    * deterministicCentroids sample — no k-means RNG, reproducible on any
    * engine). Encoding and reconstruction are pure per-row expressions; no
    * shuffle touches the corpus until the final per-query top-k window.
    *
    * Determinism note: the sub-code argmin ranks (L2 distance ASC, code
    * ASC) — identical codebook entries (duplicate sampled vectors) tie to
    * the lower code on both engines; distances of DISTINCT entries tying
    * to within one ulp is the only cross-engine divergence risk and is
    * probability ~0 for real-valued embeddings. Reconstructed vectors are
    * exact copies of sampled corpus doubles, so the output cosine is the
    * proven cosineSimNative/list_cosine_similarity bit-parity path. */
  def pqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
             queries: DataFrame, queryId: String, queryVec: String,
             k: Int, m: Int, ks: Int, dims: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    require(ks >= 1, s"ks must be >= 1, got $ks")
    val subDim = dims / m
    val c = corpus.select(col(corpusId).as("nbr_id"), asDouble(col(corpusVec)).as("cvec"))
    val q = queries.select(col(queryId).as("query_id"), asDouble(col(queryVec)).as("qvec"))
    val sample = deterministicCentroids(c, "nbr_id", "cvec", ks, "pq")
    if (sample.isEmpty)
      return q.limit(0).crossJoin(c.limit(0).select(col("nbr_id")))
        .select(col("query_id"), lit(0L).as("rank"), col("nbr_id"),
          lit(0.0).as("cosine"))
    // codebook(s)(j) = sampled vector j's s-th subvector
    val cb: IndexedSeq[IndexedSeq[Seq[Double]]] = (0 until m).map(s =>
      sample.toIndexedSeq.map { case (_, v) =>
        v.slice(s * subDim, (s + 1) * subDim).toSeq })
    // all m sub-codes in one codegen'd pass (PqCodesExpr) — the composable
    // per-subspace argmin re-entered the expression interpreter m·ks times
    // per row; semantics bit-identical (see the expression's scaladoc)
    val coded = c
      .withColumn("_codes",
        graft.functions.VectorExpressions.pqCodesNative(col("cvec"), cb, subDim))
      .select(col("nbr_id") +:
        (0 until m).map(s => element_at(col("_codes"), s + 1).as(s"c$s")): _*)
    val recon = flatten(array((0 until m).map(s =>
      element_at(typedLit(cb(s)), col(s"c$s") + 1)): _*))
    val scored = coded.withColumn("rvec", recon)
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("nbr_id"),
        cosineSimNative(col("qvec"), col("rvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cosine"))
  }

  /** L2 distance of `vec`'s s-th subvector against a literal codebook entry
    * (sequential fold — matches DuckDB's list_distance ranking use). */
  private[graft] def pqSubL2(vec: Column, s: Int, entry: Seq[Double],
      subDim: Int): Column =
    sqrt(aggregate(
      zip_with(slice(vec, s * subDim + 1, subDim), typedLit(entry),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x))

  /** Sub-code for subspace s: argmin (L2 asc, code asc) over the literal
    * codebook — pure per-row expression, no join. */
  private[graft] def pqCode(vec: Column, s: Int, cbS: IndexedSeq[Seq[Double]],
      subDim: Int): Column =
    element_at(array_sort(array(cbS.indices.map(j =>
      struct(pqSubL2(vec, s, cbS(j), subDim).as("d"), lit(j).as("j"))): _*)), 1)
      .getField("j")

  /** IVF + PQ composed (Jegou et al. 2011's IVFADC, cosine-adapted like
    * [[pqTopK]]): the corpus is partitioned by a coarse quantizer
    * (deterministic hash-sampled centroids, as [[ivfTopK]]), each vector's
    * RESIDUAL from its centroid is PQ-encoded against a shared residual
    * codebook, and a query scores reconstructed vectors
    * (centroid + decoded residual) in its `nProbe` probed lists only.
    * This is the standard billion-vector architecture: storage per vector
    * is one small list id + m sub-codes (the raw vector is never read at
    * query time), candidate work is |corpus|/nLists · nProbe per query,
    * and both the centroid set and the codebook are plan literals — the
    * corpus is touched by one assignment scan, one fixed-point mean
    * aggregation (a single Lloyd refinement of the hash seeds — see the
    * inline note), one encode scan, and one inverted-list join (query);
    * no shuffle until the final top-k window.
    *
    * Residual encoding (not raw-vector encoding, as [[pqTopK]]) is what
    * makes the composition worth having: residuals concentrate near zero,
    * so the same ks codebook entries quantize them far more accurately
    * than the raw spread — the PQ paper's central observation. */
  def ivfPqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                k: Int, nLists: Int, nProbe: Int, m: Int, ks: Int,
                dims: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val subDim = dims / m
    val c = corpus.select(col(corpusId).as("nbr_id"), asDouble(col(corpusVec)).as("cvec"))
    val q = queries.select(col(queryId).as("query_id"), asDouble(col(queryVec)).as("qvec"))
    // coarse SEEDS with POSITIONAL list ids 0..nLists-1 (stable lookup
    // key for the literal centroid table; corpus ids would force a join)
    val centRows = deterministicCentroids(c, "nbr_id", "cvec", nLists, "ivfpq")
    val cbRows = deterministicCentroids(c, "nbr_id", "cvec", ks, "ivfpqcb")
    if (centRows.isEmpty || cbRows.isEmpty)
      return q.limit(0).crossJoin(c.limit(0).select(col("nbr_id")))
        .select(col("query_id"), lit(0L).as("rank"), col("nbr_id"),
          lit(0.0).as("cosine"))
    val seeds: Array[(Long, Array[Double])] =
      centRows.zipWithIndex.map { case ((_, v), p) => (p.toLong, v) }
    // ONE exact Lloyd refinement step: assign every vector to its nearest
    // seed, then replace each seed with its list MEAN — hash-sampled data
    // points are unbiased but high-variance quantizers, and residuals only
    // concentrate (the property residual PQ needs) around means. The mean
    // uses the emb_centroids fixed-point discipline — floor(x·2³⁰) decimal
    // sums, then /2³⁰/n — so the oracle recomputes bit-identical centroids;
    // a float AVG would be partition-order dependent and break the hash
    // gate. One extra corpus pass, one (nLists·dims)-key aggregation; the
    // collected means are nLists·dims doubles — bounded driver work.
    // Every seed assigns to itself (self-cosine 1.0 is the max), so no
    // list is empty and positions survive the refinement.
    val assigned0 = c
      .withColumn("cnrm", sqrt(VectorExpressions.sqNormNative(col("cvec"))))
      .withColumn("p", graft.functions.VectorExpressions
        .nearestCentroidIdNative(col("cvec"), col("cnrm"), seeds))
    val meanRows = assigned0
      .select(col("p"), posexplode(col("cvec")))
      .groupBy("p", "pos")
      .agg(sum(floor(col("col") * lit(1073741824.0)).cast("decimal(28,0)"))
          .as("sq"),
        count(lit(1)).as("n"))
      .select(col("p"), col("pos"),
        (col("sq").cast("double") / lit(1073741824.0) / col("n").cast("double"))
          .as("mv"))
      .collect()
    val dims0 = seeds.head._2.length
    val meanByP: Map[Long, Array[Double]] = meanRows
      .groupBy(_.getLong(0))
      .map { case (p, rows) =>
        val arr = new Array[Double](dims0)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        p -> arr
      }
    val cents: Array[(Long, Array[Double])] =
      seeds.map { case (p, seed) => (p, meanByP.getOrElse(p, seed)) }
    val centVecs: Seq[Seq[Double]] = cents.toIndexedSeq.map(_._2.toSeq)
    // driver-side replica of the Column-side assignment rule (guarded
    // cosine desc, position asc; same sequential fold arithmetic), used to
    // derive the RESIDUAL codebook from the sampled vectors — bounded
    // driver work (ks · nLists · dims)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    def assignPos(v: Array[Double]): Int = {
      val nv = norm(v)
      var best = 0; var bestCos = Double.NegativeInfinity
      var p = 0
      while (p < cents.length) {
        val cvec = cents(p)._2
        val raw = dot(v, cvec) / (nv * norm(cvec))
        val cos =
          if (raw.isNaN) Double.NegativeInfinity
          else math.min(math.max(raw, -1.0), 1.0)
        if (cos > bestCos) { bestCos = cos; best = p }
        p += 1
      }
      best
    }
    // cbRes(s)(j) = sampled vector j's residual subvector for subspace s
    val cbResiduals: IndexedSeq[Array[Double]] = cbRows.toIndexedSeq.map {
      case (_, v) =>
        val cvec = cents(assignPos(v))._2
        Array.tabulate(v.length)(i => v(i) - cvec(i))
    }
    val cbRes: IndexedSeq[IndexedSeq[Seq[Double]]] = (0 until m).map(s =>
      cbResiduals.map(_.slice(s * subDim, (s + 1) * subDim).toSeq))
    // corpus encode: ONE scan — assign list, form residual, take m codes
    val assigned = c
      .withColumn("cnrm", sqrt(VectorExpressions.sqNormNative(col("cvec"))))
      .withColumn("list_id", graft.functions.VectorExpressions
        .nearestCentroidIdNative(col("cvec"), col("cnrm"), cents))
      .withColumn("rvec", zip_with(col("cvec"),
        element_at(typedLit(centVecs), (col("list_id") + 1).cast("int")),
        (a, b) => a - b))
    val coded = assigned
      .withColumn("_codes", graft.functions.VectorExpressions
        .pqCodesNative(col("rvec"), cbRes, subDim))
      .select(col("nbr_id") +: col("list_id") +:
        (0 until m).map(s => element_at(col("_codes"), s + 1).as(s"c$s")): _*)
    // reconstruction = centroid + decoded residual (exact doubles on both
    // engines: elementwise adds of literal values)
    val reconRes = flatten(array((0 until m).map(s =>
      element_at(typedLit(cbRes(s)), col(s"c$s") + 1)): _*))
    val recon = coded.withColumn("rvec", zip_with(
      element_at(typedLit(centVecs), (col("list_id") + 1).cast("int")),
      reconRes, (a, b) => a + b))
    // query probes its nProbe nearest lists; candidates come from the
    // inverted-list join only
    val probes = q
      .withColumn("qnrm", sqrt(VectorExpressions.sqNormNative(col("qvec"))))
      .select(col("query_id"), col("qvec"),
        explode(slice(nearestCentroids(col("qvec"), col("qnrm"), cents),
          1, nProbe)).as("_p"))
      .select(col("query_id"), col("qvec"), col("_p.list_id").as("list_id"))
    val scored = recon.join(broadcast(probes), Seq("list_id"))
      .select(col("query_id"), col("nbr_id"),
        cosineSimNative(col("qvec"), col("rvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cosine"))
  }

  /** LSH-bucketed ANN: candidates = same-bucket pairs (plus queries always
    * examine their own bucket), ranked by exact cosine within the bucket.
    * Recall < 1.0 by construction; bucket count 2^nPlanes bounds work. */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, nPlanes: Int, dims: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("nbr_id"), asDouble(col(corpusVec)).as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), dims, nPlanes))
    val q = queries.select(col(queryId).as("query_id"), asDouble(col(queryVec)).as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), dims, nPlanes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("nbr_id"),
        cosineSimNative(col("qvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cosine"))
  }

  /** Multi-probe LSH ANN: each query examines its own bucket PLUS every
    * bucket at Hamming distance 1 (flip one hyperplane bit) — the standard
    * recall lift for sign-bucket LSH (a true neighbor disagreeing with the
    * query on exactly one of the nPlanes planes is recovered). Work scales
    * on the QUERY side only: (nPlanes+1) bucket lookups per query, corpus
    * bucketing unchanged — at 100 TB the corpus is still hashed once and
    * the probe fan-out rides the broadcast query side of the bucket join.
    * Candidates stay distinct (a corpus vector lives in one bucket; probe
    * buckets are distinct), so ranking needs no dedup. Measured on the
    * fixture: recall@10 roughly triples vs [[lshTopK]] single-probe
    * (see the ann_recall catalog entry). */
  def lshMultiProbeTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                        queries: DataFrame, queryId: String, queryVec: String,
                        k: Int, nPlanes: Int, dims: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("nbr_id"), asDouble(col(corpusVec)).as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), dims, nPlanes))
    val masks = lit(0L) +: (0 until nPlanes).map(p => lit(1L << p))
    val q = queries.select(col(queryId).as("query_id"), asDouble(col(queryVec)).as("qvec"))
      .withColumn("bucket0", lshBucket(col("qvec"), dims, nPlanes))
      .withColumn("mask", explode(array(masks: _*)))
      .select(col("query_id"), col("qvec"),
        col("bucket0").bitwiseXOR(col("mask")).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("nbr_id"),
        cosineSimNative(col("qvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("nbr_id"), col("cosine"))
  }
}
