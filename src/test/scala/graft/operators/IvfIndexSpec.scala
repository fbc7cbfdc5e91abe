package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF index artifact's headline property: persist `assigned` with
  * `partitionBy("list_id")` and a query through [[Similarity.ivfTopKFromIndex]]
  * (a) prunes the scan to the probed lists at the FILE level — the
  * nProbe/nLists query-cost shape a 100 TB vector store needs — and
  * (b) stays bit-identical to the monolithic [[Similarity.ivfTopK]] after
  * the parquet round-trip (including the partition-column type change:
  * a partition column reads back as its inferred type, handled by the
  * cast("long") inside ivfTopKFromIndex). */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("parquet round-trip: partition pruning + bit-identical to ivfTopK") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val (cents, assigned) =
      Similarity.buildIvfIndex(e, "vec_id", "embedding", nLists = 16)

    val tmp = java.nio.file.Files.createTempDirectory("ivf_index").toFile
    tmp.deleteOnExit()
    val centPath = s"${tmp.getAbsolutePath}/centroids"
    val asgPath = s"${tmp.getAbsolutePath}/assigned"
    cents.write.mode("overwrite").parquet(centPath)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(asgPath)

    val centsR = spark.read.parquet(centPath)
    val assignedR = spark.read.parquet(asgPath)
    val queries = e.where(col("vec_id") < 5)
    val fromIndex = Similarity.ivfTopKFromIndex(centsR, assignedR, queries,
      "vec_id", "embedding", k = 10, nProbe = 4)

    // (b) bit-identical output vs the monolithic operator
    val got = fromIndex.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = Similarity.ivfTopK(e, "vec_id", "embedding", queries,
        "vec_id", "embedding", k = 10, nLists = 16, nProbe = 4)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)

    // (a) the scan over the index is partition-pruned: the isin literal
    // filter lands in the scan's partitionFilters and the number of
    // partitions actually read is the probed subset, not all lists
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val indexScans = scans(fromIndex.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("assigned")))
    assert(indexScans.nonEmpty, "no file scan over the persisted index found")
    val scan = indexScans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "list_id")),
      s"probe filter did not reach partitionFilters: ${scan.partitionFilters}")
    val totalLists = new java.io.File(asgPath).listFiles()
      .count(_.getName.startsWith("list_id="))
    val readDirs = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values).length
    assert(readDirs < totalLists,
      s"expected pruned scan, read $readDirs of $totalLists partitions")
    assert(readDirs > 0)
  }
}
