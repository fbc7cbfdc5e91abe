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
