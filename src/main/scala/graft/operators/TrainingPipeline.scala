package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation: the composed pipeline a user of
  * this library runs over a raw document corpus. Every stage is one of the
  * library's shuffle-bounded operators, so the whole chain scales the same
  * way its parts do; each stage's row counts are reported for auditability.
  *
  *   raw docs → quality filter → repetition filter (Gopher) →
  *   language filter → exact dedup →
  *   near-dup clustering (keep cluster canonical) → deterministic sample →
  *   sharded hive-partitioned export
  */
object TrainingPipeline {

  case class StageCounts(raw: Long, quality: Long, repetition: Long,
                         language: Long, exactDedup: Long, nearDedup: Long,
                         sampled: Long)

  /** Run the full chain; returns the surviving rows and per-stage counts.
    * `sampleMod` keeps ~1/sampleMod of rows (hash-deterministic; 1 = keep
    * all). Writes sharded parquet to `outDir` when non-empty.
    * `maxClusterIters` bounds the near-dup label-propagation rounds
    * (clusterNearDups throws rather than return partial labels — a corpus
    * whose duplicate-cluster diameter exceeds the bound needs this raised,
    * without forking the operator). */
  def prepare(docs: DataFrame, idCol: String, textCol: String, langCol: String,
              keepLangs: Set[String], jaccardThreshold: Double = 0.35,
              sampleMod: Int = 1, outDir: String = "",
              nShards: Int = 8, maxShingleDocFreq: Int = 10000,
              maxClusterIters: Int = 50): (DataFrame, StageCounts) = {
    val raw = docs.count()

    // 1. quality: token/stopword/punctuation heuristics. Cached: without a
    // materialization boundary here, CollapseProject INLINES the stage's
    // stopword/punct replace-chains into every downstream reference — the
    // repetition stage's array lambdas then re-evaluate them per element
    // (measured 28 s vs 2.3 s for one repetition pass at sf0.1). The cache
    // stores the surviving rows projected back to the RAW columns, so it
    // is a stage boundary, not an expression cache — the same reason a
    // production pipeline materializes between stages.
    val quality = TextAnalysis.withQualityScore(docs, textCol)
      .where(col("quality_ok"))
      .select(docs.columns.toIndexedSeq.map(col): _*)
      .cache()
    val nQuality = quality.count()

    // 2. repetition filter: Gopher-style duplicate-word/-trigram and
    // top-bigram coverage gates (boilerplate and degenerate generations).
    // The flag is MATERIALIZED before filtering: a direct
    // where(repetition_ok) lets PushDownPredicate inline the stats'
    // array lambdas into the filter condition, where `_words` loses its
    // once-per-row projection slot and split() re-evaluates per lambda
    // element — O(doc_len²) per row, measured 28 s vs 0.3 s for one pass
    // at sf0.1. Projecting the flag (cheap plan: every alias computed
    // once), localCheckpointing the tiny (id, flag) frame, and
    // semi-joining keeps the operator's scan-shape intact.
    val repOk = TextAnalysis.withRepetitionStats(quality, idCol, textCol)
      .select(col(idCol), col("repetition_ok"))
      .localCheckpoint(true)
    val repetition = quality.join(
      repOk.where(col("repetition_ok")).select(col(idCol)),
      Seq(idCol), "left_semi")
    val nRepetition = repetition.count()

    // 3. language allowlist. Cached: stages 4+ read this frame from BOTH
    // sides (fingerprint keeper-ids AND the semi-join spine), and each
    // uncached read would replay the full quality+repetition expression
    // chain — measured 116 s -> ~35 s at sf0.1 for the whole pipeline.
    val lang = repetition.where(col(langCol).isin(keepLangs.toSeq: _*))
      .cache()
    val nLang = lang.count()

    // 4. exact dedup: keep the lowest-id row per normalized fingerprint.
    // Cached: the near-dup stage below (shingle join + iterative clustering)
    // is the dominant cost and reads `exact` several times — without the
    // cache every downstream count() replays stages 1-3 too.
    val keeperIds = Dedup.byFingerprint(lang, idCol, textCol)
      .select(col(idCol))
    val exact = lang.join(keeperIds, Seq(idCol), "left_semi").cache()
    val nExact = exact.count()
    try {
      // 5. near-dup clustering: connected components over jaccard>=t pairs;
      // keep each cluster's canonical (minimum-id) member. The hot-shingle
      // df cap keeps boilerplate shingles from making any join group
      // quadratic in corpus size.
      val pairs = Dedup.ngramJaccardPairs(exact, idCol, textCol, k = 5,
        threshold = jaccardThreshold,
        maxDocFreq = maxShingleDocFreq).select(col("id_a"), col("id_b"))
      val clusters = Dedup.clusterNearDups(
        exact.select(col(idCol).as("id")), pairs, maxClusterIters)
      val canon = clusters.where(col("id") === col("cluster_id"))
        .select(col("id").as(idCol))
      val near = exact.join(canon, Seq(idCol), "left_semi").cache()
      try {
        val nNear = near.count()

        // 6. deterministic hash sample (stratified by construction)
        val sampled = if (sampleMod <= 1) near else near.where(
          graft.functions.hash60(concat(lit("smpl#"), col(idCol).cast("string")))
            % sampleMod === 0)
        val nSampled = sampled.count()

        // 7. sharded export
        if (outDir.nonEmpty)
          OutputLayout.writeSharded(sampled, outDir, idCol, Seq(langCol), nShards)

        (sampled, StageCounts(raw, nQuality, nRepetition, nLang, nExact, nNear, nSampled))
      } finally near.unpersist(false)
    } finally {
      exact.unpersist(false)
      lang.unpersist(false)
      quality.unpersist(false)
    }
  }
}
