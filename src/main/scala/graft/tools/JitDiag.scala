package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mechanism-level adjudicator for the `dedup_substring_600k__rep` bench
  * anomaly (judge r10 item 1): the second lap of the codegen'd span-hash
  * pass read 30.2 s against an 11.2 s first lap with 16.3 s of JIT
  * compiler time inside the rep bracket — on a plan whose generated source
  * is IDENTICAL between laps, so a warm codegen cache should have made the
  * rep the fast one.
  *
  * Hypotheses this main discriminates, each with its own measured bracket:
  *
  *  - H1 codegen-cache eviction: Catalyst's generated-class cache holds
  *    100 entries; the ~200 catalog entries between the first lap and the
  *    rep section evict the span-hash classes, so the rep REGENERATES and
  *    RECOMPILES them (janino), and HotSpot must re-profile + re-JIT the
  *    brand-new class from zero while the lap runs at interpreter/C1
  *    speed. Simulated here by compiling >120 distinct throwaway plans
  *    between laps; verified if rep-after-evict >> rep2 (immediate rerun,
  *    cache warm again).
  *  - H2 code-cache flushing: the sweep fills the JVM's reserved code
  *    cache (240 MB default), UseCodeCacheFlushing evicts cold nmethods,
  *    and the rep re-JITs what was flushed. Verified by the CodeHeap pool
  *    occupancy brackets (near-capacity at rep time) — and refuted by
  *    them staying low.
  *  - H3 huge-method bail: the generated method exceeds HotSpot's
  *    DontCompileHugeMethods cap (8000 bytecode bytes) and never JITs at
  *    all. Refuted/confirmed by METRIC_GENERATED_METHOD_BYTECODE_SIZE's
  *    max.
  *
  * Prints one JSON line per lap with wall seconds plus deltas of: JIT
  * compiler ms, janino compile count/ms, max generated-method bytecode
  * bytes, and per-CodeHeap used/committed MB.
  */
object JitDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import scala.jdk.CollectionConverters._
    def jitMs(): Long =
      java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
    def codeHeaps(): Map[String, (Double, Double)] =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => p.getName ->
          ((p.getUsage.getUsed / 1e6, p.getUsage.getMax / 1e6))).toMap
    def codegen(): (Long, Long, Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getMax,
        m.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot.getMax,
        m.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getSnapshot.getMax)
    }

    def thunk(): Unit =
      graft.operators.Dedup.exactSubstrStats(
          graft.sources.Generators.syntheticCorpus(spark, 600000L),
          "doc_id", "text", clean = true)
        .write.format("noop").mode("overwrite").save()

    def lap(label: String): Unit = {
      System.gc()
      val j0 = jitMs(); val (cc0, _, _, _) = codegen()
      val h0 = codeHeaps()
      val t0 = System.nanoTime()
      thunk()
      val wall = (System.nanoTime() - t0) / 1e9
      val (cc1, maxCompMs, maxMeth, maxClass) = codegen()
      val h1 = codeHeaps()
      val heaps = h1.map { case (k, (u1, mx)) =>
        val u0 = h0.get(k).map(_._1).getOrElse(0.0)
        f""""${k.replace("CodeHeap ", "").replace("'", "")}":{"used_mb":$u1%.1f,"d_mb":${u1 - u0}%.1f,"max_mb":$mx%.0f}"""
      }.mkString(",")
      println(f"""{"lap":"$label","wall_sec":$wall%.2f,"jit_sec":${(jitMs() - j0) / 1000.0}%.1f,"janino_compiles":${cc1 - cc0},"janino_max_ms":$maxCompMs,"max_method_bytes":$maxMeth,"max_class_bytes":$maxClass,$heaps}""")
    }

    // >120 distinct plans (distinct generated source each: the projection
    // width varies) to churn Catalyst's 100-entry generated-class cache,
    // standing in for the ~200 catalog entries between first lap and rep
    def evictCodegenCache(): Unit = {
      (1 to 130).foreach { i =>
        spark.range(4)
          .select((0 to (i % 37) + 2).map(j =>
            (col("id") * lit(j + i * 41)).as(s"c${i}_$j")): _*)
          .agg(sum(col(s"c${i}_0"))).head()
      }
    }

    lap("first")
    lap("immediate_rep")      // warm cache, warm JIT: the control
    evictCodegenCache()
    lap("rep_after_evict")    // H1: regenerated classes, cold JIT
    lap("rep2_after_evict")   // discriminator: fast => H1, slow => pollution
    spark.stop()
  }
}
