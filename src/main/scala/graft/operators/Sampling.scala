package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling operators. All three use the
  * portable 60-bit md5 hash rank in place of a random draw — a reproducible
  * uniform permutation that is stable across runs, repartitioning, engines
  * (the DuckDB oracles recompute it bit-for-bit), and incremental appends.
  *
  * Scale shapes: the rate sample is a pure filter (scan speed, no shuffle);
  * both bottom-k forms run through the bounded [[TopKAgg]], so every map
  * task reduces its slice to ≤ k (rank, id) pairs before the shuffle —
  * shuffle volume O(k · strata · mappers) regardless of input size, never a
  * full sort. Cited shapes: KMV/bottom-k sketches (Bar-Yossef et al.) for
  * the uniform form; Ohlsson's sequential Poisson sampling for the
  * weighted form.
  */
object Sampling {

  private def rank(idCol: Column, tag: String): Column =
    graft.functions.hash60(concat(lit(tag + "#"), idCol.cast("string")))

  /** Fixed-RATE sample: keep rows whose hash rank falls in 1/`modulus` of
    * the key space (deterministic analog of `sample(fraction)`). */
  def rateSample(df: DataFrame, idCol: String, modulus: Int,
                 tag: String = "smpl"): DataFrame =
    df.where(pmod(rank(col(idCol), tag), lit(modulus)) === 0)

  /** Fixed-SIZE uniform sample per stratum: bottom-k by hash rank (KMV).
    * Returns (strataCol, rk, idCol, h) with rk = 1..min(k, |stratum|). */
  def bottomK(df: DataFrame, strataCol: String, idCol: String, k: Int,
              tag: String = "rsv"): DataFrame = {
    val topk = udaf(new TopKAgg(k), TopK.inputEncoder)
    df.select(col(strataCol), rank(col(idCol), tag).as("h"), col(idCol))
      .groupBy(strataCol)
      // TopKAgg ranks (v desc, id asc); v = −h ⇒ (h asc, id asc) bottom-k
      .agg(topk(-col("h"), col(idCol)).as("top"))
      .select(col(strataCol), posexplode(col("top")))
      .select(col(strataCol), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as(idCol), (-col("col.v")).as("h"))
  }

  /** WEIGHTED sample without replacement — Ohlsson's sequential Poisson
    * (priority) sampling: priority q = u / w (u the hash rank, w the
    * weight), k smallest priorities win, inclusion probability ∝ w. The
    * priority is EXACT 64-bit integer division (`hash60 div w`, ties by
    * id) — order-equivalent to the real-valued q at ~2^50 resolution with
    * zero cross-engine float risk. Rows with w ≤ 0 are excluded. Returns
    * (rk, idCol, pri) with rk = 1..min(k, n). */
  def weightedBottomK(df: DataFrame, idCol: String, weightCol: String,
                      k: Int, tag: String = "wsmp"): DataFrame = {
    val topk = udaf(new TopKAgg(k), TopK.inputEncoder)
    // internal names can't collide with user columns; backticks guard
    // exotic user column names in the div expression
    df.where(col(weightCol) > 0)
      .select(rank(col(idCol), tag).as("__wrank"),
        col(weightCol).as("__wweight"), col(idCol))
      .select(expr("`__wrank` div `__wweight`").as("pri"), col(idCol))
      .agg(topk(-col("pri"), col(idCol)).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("rk"),
        col("col.id").as(idCol), (-col("col.v")).as("pri"))
  }

  /** Weighted UPSAMPLING with replacement — the materialized face of an
    * epoch-mixing schedule (weight 2.5 ⇒ every row of the stratum appears
    * twice, plus a deterministic 50 % chance of a third copy). Weights are
    * integer micro-units: copies = w div 10^6 + [hash60(tag#id) mod 10^6
    * < w mod 10^6], so expected copies per row is exactly w/10^6 and the
    * realization is a reproducible pure function of the id (stable under
    * re-runs, repartitioning, and appends — the property every sampler in
    * this file guarantees). Strata absent from `weightsU6` keep exactly
    * one copy. Output: (strataCol, idCol, epoch 0..copies−1); rows with
    * zero copies vanish (weights < 10^6 downsample). Pure projection +
    * explode — no shuffle; output volume = Σ stratum_n · w. */
  def upsampleByWeight(df: DataFrame, strataCol: String, idCol: String,
                       weightsU6: Map[String, Long],
                       tag: String = "ups"): DataFrame = {
    require(weightsU6.values.forall(_ >= 0L), "weights must be nonnegative")
    val M = 1000000L
    val w: Column = weightsU6.foldLeft(lit(M)) { case (acc, (stratum, v)) =>
      when(col(strataCol) === stratum, lit(v)).otherwise(acc)
    }
    val copies = floor(w.cast("double") / M.toDouble).cast("long") +
      when(pmod(rank(col(idCol), tag), lit(M)) < w % M, 1L).otherwise(0L)
    df.select(col(strataCol), col(idCol), copies.as("_n"))
      .select(col(strataCol), col(idCol),
        explode(when(col("_n") > 0, sequence(lit(0L), col("_n") - 1))
          .otherwise(array().cast("array<bigint>"))).as("epoch"))
  }
}
