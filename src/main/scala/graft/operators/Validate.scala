package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/Great-Expectations
  * shape): a rule suite evaluated over a table in ONE conditional-aggregation
  * pass, plus a row-level quarantine split for the violating records.
  *
  * Scale design: `checkRules` is a single partial-aggregating pass — every
  * rule becomes one `sum(when(...))` in the same `agg`, so the table is
  * scanned ONCE regardless of rule count and only `|rules|` longs cross the
  * shuffle per map task. The per-rule unpivot happens on the 1-row result.
  * `quarantine` is a stateless filter+projection (scan-speed, fully
  * pushdown-friendly); the failed-rule list is computed per row with no
  * join against the rule counts.
  *
  * Null semantics: a rule whose predicate evaluates to NULL on a row (e.g.
  * a comparison against a NULL column) counts as a VIOLATION — data quality
  * checks must treat "unknown" as "not proven valid". Both methods share
  * this via [[violated]].
  */
object Validate {

  /** NULL-safe violation test: true when `pred` is false OR null. */
  private def violated(pred: Column): Column = !coalesce(pred, lit(false))

  /** Evaluate `rules` (name → predicate) over `df` in one aggregation pass.
    * Returns one row per rule: (rule, violations, n_rows, ok), sorted by
    * rule name. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rule suite must not be empty")
    val aggs = rules.map { case (name, pred) =>
      sum(when(violated(pred), 1L).otherwise(0L)).as(s"__v_$name")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row aggregate with stack(): driver never sees the data
    val stackArgs = rules.map { case (name, _) =>
      s"'$name', __v_$name"
    }.mkString(", ")
    one.select(
        expr(s"stack(${rules.size}, $stackArgs) AS (rule, violations)"),
        col("__n").as("n_rows"))
      .select(col("rule"), col("violations"), col("n_rows"),
        (col("violations") === 0L).as("ok"))
      .orderBy("rule")
  }

  /** k-anonymity audit: group the table by its quasi-identifier columns
    * and flag equivalence classes smaller than `k` — the standard
    * re-identification-risk check run before releasing or training on
    * user-adjacent data. One partial-aggregating groupBy on the
    * quasi-identifier key; class count is bounded by the identifier
    * domain, not the table. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi-ids and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** Content-integrity manifest: per id-bucket row count + XOR-folded
    * row fingerprint. Two datasets are byte-identical on a bucket iff
    * (n_rows, xor_fp) match — the cheap reproducibility/versioning audit
    * a pipeline runs after every materialization. XOR is commutative, so
    * the fold is partial-aggregable and row-order free; one groupBy on
    * `buckets` keys regardless of table size. */
  def contentManifest(df: DataFrame, idCol: String, hashInput: Column,
                      buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.select(pmod(col(idCol), lit(buckets.toLong)).as("bucket"),
        graft.functions.hash60(hashInput).as("_h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_h)").as("xor_fp"))
  }

  /** Row-level quarantine: rows violating AT LEAST one rule, projected to
    * `keep` plus a `failed` column — the comma-joined, suite-ordered names
    * of the violated rules. Clean rows are dropped (the complement filter
    * is the retained set). */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)],
                 keep: Seq[String]): DataFrame = {
    require(rules.nonEmpty, "rule suite must not be empty")
    val tags = rules.map { case (name, pred) =>
      when(violated(pred), lit(name))
    }
    df.select(keep.map(col) :+
        concat_ws(",", array_compact(array(tags: _*))).as("failed"): _*)
      .where(col("failed") =!= "")
  }
}
