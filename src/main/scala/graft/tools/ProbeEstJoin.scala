package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dedup_minhash_est_600k verification-join A/B (judge r14 item 5): now
  * that the r14 semi-join prefilter prunes the doc side 5.5x, re-test
  * whether carrying both docs' shingle arrays through ONE exploded pair
  * join beats the two sequential id-keyed joins (the r7 "materializing
  * the explode loses" result predates the prune).
  *
  * Variants, interleaved (A B C A B C) so steal waves can't swallow one
  * side; each is the full audit body at 600k docs / samplePairsMod 4:
  *  A. current shape: two sequential shuffle_hash joins (pairs build side)
  *  B. single-join: explode each pair to (pair, side, id), join docArr
  *     once, regroup by pair collecting the two arrays. Shuffle math says
  *     this LOSES (the regroup re-shuffles pairs x full arrays, ~1.15 GB,
  *     vs the saved second docArr pass, ~0.75 GB) — measured to close the
  *     verdict item with numbers either way.
  *  C. current shape + docArr pinned (localCheckpoint) after the prune, so
  *     the shingle-hash projection over the pruned corpus runs once
  *     instead of once per join side.
  *
  * Shared: candidates + prefilter identical across variants (the thing
  * being A/B'd is only the verification attach). Diagnostic only. */
object ProbeEstJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def stealTicks(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        val line = try src.getLines().next() finally src.close()
        line.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L)
      } catch { case _: Throwable => 0L }

    val corpus = graft.sources.Generators.syntheticCorpus(spark, 600000L)
      .localCheckpoint(true)
    val numHashes = 16
    val k = 5
    val mod = 4

    // shared candidate + sampled-pair derivation (identical to the
    // operator's: minhashCandidates -> agree_n -> hash-sample -> pin)
    val cand = graft.operators.Dedup
      .minhashCandidates(corpus, "doc_id", "text", k, numHashes, 4)
      .select(col("id_a"), col("id_b"),
        (col("est_jaccard") * numHashes).cast("long").as("agree_n"))
      .where(pmod(graft.functions.hash60(
        concat(lit("estsamp#"), col("id_a").cast("string"), lit("_"),
          col("id_b").cast("string"))), lit(mod.toLong)) === 0)
      .localCheckpoint(true)
    println(s"sampled pairs: ${cand.count()}")

    def docSrc: DataFrame = corpus.join(
      broadcast(cand.select(col("id_a").as("_pid"))
        .unionAll(cand.select(col("id_b").as("_pid"))).distinct()),
      corpus("doc_id") === col("_pid"), "left_semi")
    def mkDocArr: DataFrame = docSrc
      .select(col("doc_id").as("_did"),
        graft.functions.TextExpressions.sortedShingleHashes(
          graft.functions.normText(col("text")), k).as("_shs"))

    def finish(joined: DataFrame): Unit =
      joined.select(col("id_a"), col("id_b"), col("agree_n"),
          graft.functions.TextExpressions.sortedIntersectCount(
            col("_sa"), col("_sb")).as("common"),
          (size(col("_sa")) + size(col("_sb"))).cast("long").as("_szsum"))
        .select(col("id_a"), col("id_b"), col("agree_n"), col("common"),
          (col("_szsum") - col("common")).as("union_sz"))
        .write.format("noop").mode("overwrite").save()

    def variantA(): Unit = {
      val docArr = mkDocArr
      finish(cand.hint("shuffle_hash")
        .join(docArr.select(col("_did").as("id_a"), col("_shs").as("_sa")),
          Seq("id_a"))
        .hint("shuffle_hash")
        .join(docArr.select(col("_did").as("id_b"), col("_shs").as("_sb")),
          Seq("id_b")))
    }
    def variantB(): Unit = {
      val docArr = mkDocArr
      val exploded = cand.select(col("id_a"), col("id_b"), col("agree_n"),
        explode(array(struct(col("id_a").as("_did"), lit(0).as("_side")),
          struct(col("id_b").as("_did"), lit(1).as("_side")))).as("_e"))
        .select(col("id_a"), col("id_b"), col("agree_n"),
          col("_e._did").as("_did"), col("_e._side").as("_side"))
      val joined = exploded.hint("shuffle_hash").join(docArr, Seq("_did"))
        .groupBy("id_a", "id_b", "agree_n")
        .agg(min(when(col("_side") === 0, col("_shs"))).as("_sa"),
          min(when(col("_side") === 1, col("_shs"))).as("_sb"))
      finish(joined)
    }
    def variantC(): Unit = {
      val docArr = mkDocArr.localCheckpoint(true)
      try finish(cand.hint("shuffle_hash")
        .join(docArr.select(col("_did").as("id_a"), col("_shs").as("_sa")),
          Seq("id_a"))
        .hint("shuffle_hash")
        .join(docArr.select(col("_did").as("id_b"), col("_shs").as("_sb")),
          Seq("id_b")))
      finally docArr.unpersist()
    }

    def lap(name: String, f: () => Unit): Unit = {
      System.gc()
      val s0 = stealTicks(); val t0 = System.nanoTime()
      f()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"RESULT $name: $t%.2f s steal=${(stealTicks() - s0) / 100.0}%.1f")
    }
    val laps = args.headOption.map(_.toInt).getOrElse(3)
    for (_ <- 1 to laps) {
      lap("A_two_joins", variantA)
      lap("B_single_join_regroup", variantB)
      lap("C_two_joins_pinned_docarr", variantC)
    }
    spark.stop()
  }
}
