package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output layout for training-data exports: hive-partitioned, size-capped,
  * optionally salted shard files.
  *
  * At 100 TB the write layout is as load-bearing as the compute: training
  * readers want (a) partition pruning by coarse keys (lang/source/date),
  * (b) bounded file sizes for parallel ingestion, (c) deterministic shard
  * assignment so re-runs produce identical layouts. This composes the three:
  * hive-style `partitionBy`, `maxRecordsPerFile`, and an md5-derived shard
  * column that spreads rows evenly regardless of input order (no RNG, no
  * round-robin nondeterminism).
  */
object OutputLayout {

  /** Deterministic shard id in [0, nShards) from a stable key column. */
  def shardId(key: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column =
    pmod(graft.functions.hash60(concat(lit("shard#"), key.cast("string"))),
      lit(nShards)).cast("int")

  /** Deterministic TRAINING-ORDER shuffle, sharded: every row gets one
    * shuffle key = hash60(seed#id); shard = key mod nShards and the
    * position within the shard is the key's rank there (id tiebreak).
    * Reading shards in (shard, pos_in_shard) order replays one fixed
    * pseudo-random permutation of the corpus — the reproducible global
    * shuffle a training run needs, WITHOUT a global sort: the only
    * exchange is the shard hash partition and each rank window sorts one
    * shard (corpus/nShards rows — pick nShards so a shard fits a task,
    * exactly the writeSharded sizing rule). Changing `seed` yields an
    * independent epoch permutation. */
  def shuffleOrder(df: DataFrame, idCol: String, nShards: Int,
                   seed: String = "shuf"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val skey = graft.functions.hash60(
      concat(lit(s"$seed#"), col(idCol).cast("string")))
    df.select(col(idCol), skey.as("_skey"),
        pmod(skey, lit(nShards.toLong)).cast("int").as("shard"))
      .withColumn("pos_in_shard",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("_skey"), col(idCol))) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos_in_shard"))
  }

  /** Write `df` hive-partitioned by `partitionCols`, distributed into
    * `nShards` deterministic shards per partition (one task → one file run),
    * each file capped at `maxRecordsPerFile` rows. Readers prune on
    * `partitionCols`; shard files are balanced by the hash, not input order. */
  def writeSharded(df: DataFrame, outDir: String, idCol: String,
                   partitionCols: Seq[String], nShards: Int,
                   maxRecordsPerFile: Long = 1000000L): Unit = {
    val sharded = df.withColumn("_shard", shardId(col(idCol), nShards))
    sharded
      .repartition((partitionCols.map(col) :+ col("_shard")): _*)
      .sortWithinPartitions(col(idCol))
      .drop("_shard")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
  }

  /** Save `df` as a BUCKETED managed table: hash-bucketed and sorted by
    * `bucketCol` into `nBuckets` buckets. Two tables bucketed the same way
    * join with NO Exchange on either side (Catalyst proves co-partitioning
    * from the bucket spec) — at 100 TB this turns every recurring
    * fact-to-fact equi-join on the bucket key from a full shuffle into a
    * local zip of bucket files, and large aggregations on the key skip
    * their shuffle the same way. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
