package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder

import graft.core.Point

/** Seeded synthetic distributions, semantics per the reference producers
  * (`python/unified_producer.py:50-123`): integer-valued dims in
  * [dMin, dMax]; uniform / correlated (ρ=0.9 noise band) / anti-correlated
  * (random direction scaled to a target-sum plane with the ε-slack schedule
  * 2D=0.0005, 3D=0.05, 4D=0.9, else d·0.05·10).
  *
  * Scale design: generation is distributed via `spark.range` and a
  * **per-record splittable seed** (seed ⊕ id·golden-ratio) — every row's
  * randomness depends only on (seed, id), so the output is identical for any
  * partitioning/parallelism, and generating 10^12 rows needs no coordination.
  */
object Generators {

  private def rngFor(seed: Long, id: Long): java.util.Random =
    new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))

  def uniformPoint(rng: java.util.Random, dims: Int, dMin: Int, dMax: Int): Array[Double] =
    Array.fill(dims)((dMin + rng.nextInt(dMax - dMin + 1)).toDouble)

  def correlatedPoint(rng: java.util.Random, dims: Int, dMin: Int, dMax: Int,
                      rho: Double = 0.9): Array[Double] = {
    val base = dMin + rng.nextDouble() * (dMax - dMin)
    Array.fill(dims) {
      val noise = (rng.nextDouble() * 2 - 1) * (1 - rho) * (dMax - dMin)
      math.max(dMin, math.min(dMax, (base + noise).toInt)).toDouble
    }
  }

  def antiCorrelatedPoint(rng: java.util.Random, dims: Int, dMin: Int, dMax: Int): Array[Double] = {
    val epsilon = dims match {
      case 2 => 0.0005
      case 3 => 0.05
      case 4 => 0.9
      case d => d * 0.005 * 100
    }
    val vals = Array.fill(dims)(rng.nextDouble())
    val total = vals.sum
    val mean = (dMin + dMax) / 2.0 * dims
    val slack = epsilon * (dMax - dMin) * dims
    val target = mean - slack + rng.nextDouble() * 2 * slack
    val scale = if (total != 0) target / total else 1.0
    vals.map(v => math.max(dMin, math.min(dMax, (v * scale).toInt)).toDouble)
  }

  /** Query-threshold injector (reference G4, `python/unified_producer.py:25,
    * 180-188`): one trigger payload "qid,recordCount" per `threshold` records
    * produced — the workload that drives the barrier protocol. */
  def queryTriggers(totalRecords: Long, threshold: Long = 1000000L): Seq[String] = {
    (1L to totalRecords / threshold).map(q => s"$q,${q * threshold}")
  }

  /** Distributed generation of n points of the named distribution. */
  def generate(spark: SparkSession, distribution: String, n: Long, dims: Int,
               dMin: Int = 0, dMax: Int = 10000, seed: Long = 42L): Dataset[Point] = {
    implicit val enc: Encoder[Point] = ExpressionEncoder[Point]()
    val gen: (java.util.Random, Int, Int, Int) => Array[Double] = distribution match {
      case "uniform"         => uniformPoint(_, _, _, _)
      case "correlated"      => correlatedPoint(_, _, _, _)
      case "anti-correlated" => antiCorrelatedPoint(_, _, _, _)
      case other => throw new IllegalArgumentException(s"unknown distribution: $other")
    }
    spark.range(n).map { id =>
      Point(id, gen(rngFor(seed, id), dims, dMin, dMax))
    }
  }

  /** Deterministic synthetic text corpus for dedup scale-stress: n docs of
    * 40 words drawn (Murmur3 on (seed-id, position)) from a 1000-word
    * vocabulary; every id ≡ 1 (mod 50) is a planted near-duplicate of the
    * predecessor row sharing 39/40 words — web-crawl dup density (2%) on an
    * otherwise mostly-unique corpus. Zero shuffle, zero driver state; the
    * id → text map is pure, so any two invocations at any parallelism agree
    * row-for-row. */
  def syntheticCorpus(spark: SparkSession, n: Long): DataFrame =
    syntheticCorpusWords(spark, n, 40)

  /** [[syntheticCorpus]] with a configurable document length — the
    * long-document face for benchmarks whose cost term scales with text
    * VOLUME rather than row count (shingle-explode probes, winnow
    * fingerprinting): a 40-word doc is a tweet, a 160+-word doc starts to
    * look like a crawl page. Same structure: deterministic 1000-word
    * vocabulary, 2% planted near-duplicates differing in the last word. */
  def syntheticCorpusWords(spark: SparkSession, n: Long,
                           nWords: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val id = col("id")
    val srcId = when(id % 50 === 1, id - 1).otherwise(id)
    val words = (0 until nWords).map { i =>
      // dup rows differ in last word
      val seed = if (i == nWords - 1) id else srcId
      concat(lit("w"), pmod(hash(seed, lit(i)), lit(1000)))
    }
    spark.range(n).select(id.as("doc_id"),
      concat_ws(" ", words: _*).as("text"))
  }
}
