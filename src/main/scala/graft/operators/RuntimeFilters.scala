package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.hash60Seeded

/** Bloom-filter runtime semi-join reduction.
  *
  * The 100 TB pattern this implements: a selective predicate on a small
  * dimension (here: suppliers of one region) should prune the FACT side
  * before the fact rows ever reach a shuffle. Spark's own
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled` does this
  * opportunistically; this operator is the explicit, engine-portable form —
  * the filter is an md5-derived bit set, so the exact same membership test
  * (false positives included) is reproducible in ANSI SQL for the
  * correctness oracle.
  *
  * Design: the bit set is represented relationally as a tiny DataFrame of
  * set positions (≤ m rows), built with one aggregation over the dimension
  * and BROADCAST to the probe side. Each of the k probe tests is a broadcast
  * LEFT SEMI hash join — the probe side never shuffles and never widens; k
  * chained semi-joins AND the tests together. No driver-side bit array, no
  * collect: the same plan runs unchanged on a 1000-executor cluster.
  *
  * Semantics (classic Bloom): no false negatives ever; false positives at
  * the standard (1 - e^{-kn/m})^k rate. Choose m ≫ kn for production use;
  * the catalog query deliberately uses a small m so the false-positive path
  * is exercised and oracle-checked, not just theorized.
  */
object RuntimeFilters {

  /** Set bit positions of the Bloom filter over `build(keyCol)`: for each of
    * the k hash functions, position = hash60("key#seed") mod m. One shuffle
    * of ≤ k·|build| tiny rows, deduplicated to ≤ m. */
  def bloomBits(build: DataFrame, keyCol: String, m: Int, k: Int): DataFrame =
    build.select(explode(array((0 until k).map(i =>
        pmod(hash60Seeded(col(keyCol).cast("string"), i), lit(m.toLong))): _*))
        .as("pos"))
      .distinct()

  /** Rows of `probe` whose `keyCol` passes the Bloom filter: all k positions
    * present in `bits`. Each test is a broadcast semi-join; the probe side
    * stays narrow and unshuffled. */
  def bloomProbe(probe: DataFrame, keyCol: String, bits: DataFrame,
      m: Int, k: Int): DataFrame =
    (0 until k).foldLeft(probe) { (df, i) =>
      df.join(broadcast(bits),
        pmod(hash60Seeded(col(keyCol).cast("string"), i), lit(m.toLong))
          === bits("pos"),
        "leftsemi")
    }

  // The r11 `bloomBitsFast`/`bloomProbeFast` pair (the same formulation on
  // codegen'd xxhash64, for consumers whose verdicts are oracle-checked
  // against an exact twin rather than by re-deriving bit membership) was
  // retired in r12: the decontamination gate faces — its only consumers —
  // now screen with Spark's own BloomFilterAggregate/might_contain sketch
  // (one codegen'd filter, no per-batch broadcast-hashmap builds; see
  // TextAnalysis.bloomGateIndex). The hash60 pair above stays: its bit
  // positions are reproducible in ANSI SQL, which is the whole point of
  // the oracled `bloom_semi_join` operator, and its zero-driver-memory
  // relational form remains the fallback when m outgrows driver memory.
}
