package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose graph_pagerank / graph_pagerank_digraph wall time: edge
  * derivation vs setup (deg + dangling probe + edgesD cache) vs the
  * per-iteration fixpoint cost — the r14 optimization round's "where does
  * the warm 2.8-3.4 s actually go" question. Three laps each at sf0.1. */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Any): Unit =
      for (lap <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"$label lap$lap: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    def pairs = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
    def edges = graft.operators.Graph.undirectedBipartite(
      pairs, "o_custkey", "l_suppkey")

    def pairsWide = spark.read.parquet(s"$dir/orders.parquet")
      .join(graft.sources.Fixtures.tableWide(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
    def edgesWide = graft.operators.Graph.undirectedBipartite(
      pairsWide, "o_custkey", "l_suppkey")
    def t1(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // interleaved A/B (steal arrives in waves — r12 lesson)
    for (lap <- 1 to 4) {
      t1(s"lap$lap edges-count-bare") { edges.count() }
      t1(s"lap$lap edges-count-wide") { edgesWide.count() }
      t1(s"lap$lap pagerank-3-bare") {
        graft.operators.Graph.pageRank(edges, iterations = 3).count()
      }
      t1(s"lap$lap pagerank-3-wide") {
        graft.operators.Graph.pageRank(edgesWide, iterations = 3).count()
      }
    }
    t("pagerank-iter0-ish (deg+probe only, via iterations=1)") {
      graft.operators.Graph.pageRank(edges, iterations = 1).count()
    }
    t("pagerank-3") {
      graft.operators.Graph.pageRank(edges, iterations = 3).count()
    }
    def dedges = spark.read.parquet(s"$dir/orders.parquet")
      .join(graft.sources.Fixtures.tableWide(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    t("digraph-edges-count") { dedges.count() }
    t("digraph-1") {
      graft.operators.Graph.pageRankDigraph(dedges, iterations = 1).count()
    }
    t("digraph-3") {
      graft.operators.Graph.pageRankDigraph(dedges, iterations = 3).count()
    }
    spark.stop()
  }
}
