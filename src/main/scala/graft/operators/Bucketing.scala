package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: the disk-resident partitioning that makes every
  * subsequent equi-join/aggregation on the bucket key shuffle-free.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the pairwise shuffle
  * of both inputs. Writing each table ONCE with `bucketBy(n, key)` +
  * `sortBy(key)` moves that shuffle to ingest time: Catalyst recognizes the
  * matching `HashPartitioning(key, n)` output partitioning on both scans and
  * plans a sort-merge join with NO Exchange on either side — and, with
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (post-3.0 gate,
  * honored only when each bucket is one file, which [[writeBucketed]]
  * guarantees), no per-query Sort either (BucketedJoinSpec asserts both on
  * the physical plan). The
  * reference has no table layout at all — its only I/O is a Kafka topic —
  * so this is a pure scale-path addition, the on-disk sibling of the
  * z-order layout query (zorder_layout).
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered in the session catalog (required for bucket metadata —
    * plain `.parquet(path)` writes carry no bucket spec).
    *
    * The pre-write `repartition(buckets, key)` uses the same Murmur3 pmod
    * hash as the bucket spec, so each task receives exactly one bucket and
    * writes exactly ONE file per bucket — Spark only trusts the per-bucket
    * `sortBy` metadata (and can elide the join-side SortExec) when a bucket
    * is a single file. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
}
