package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Dominance, Point}
import graft.operators.{SkylineOps, SparkTestSession}

/** The custom Catalyst operator: agreement with the Aggregator path, plan
  * shape (partial → exchange → final), and the sky_dominates expression. */
class SkylinePlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("planned skyline equals aggregator skyline (duplicates preserved)") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val pts = Seq.tabulate(4000)(i =>
      (i.toLong, rng.nextInt(60).toDouble, rng.nextInt(60).toDouble))
    val df = pts.toDF("id", "v1", "v2")
    val planned = SkylinePlanApi.skyline(df, Seq("v1", "v2"))
      .as[(Long, Double, Double)].collect().toSet
    val agg = SkylineOps.skyline(pts.map { case (id, a, b) =>
      Point(id, Array(a, b)) }.toDS())
      .collect().map(p => (p.id, p.values(0), p.values(1))).toSet
    assert(planned == agg)
  }

  test("physical plan is partial -> exchange -> final (two-phase combiner)") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 3.0), (2L, 1.0, 4.0)).toDF("id", "v1", "v2")
    val phys = SkylinePlanApi.skyline(df, Seq("v1", "v2"))
      .queryExecution.executedPlan.toString
    assert(phys.contains("SkylineFinal"))
    assert(phys.contains("SkylinePartial"))
    assert(phys.contains("Exchange"))
    // the exchange must sit BETWEEN final and partial (combiner before shuffle)
    val fin = phys.indexOf("SkylineFinal")
    val ex = phys.indexOf("Exchange")
    val par = phys.indexOf("SkylinePartial")
    assert(fin < ex && ex < par)
  }

  test("filters still push below the Skyline node") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, 2.0, 3.0), (2L, 9.0, 9.0))).toDF("id", "v1", "v2")
    val out = SkylinePlanApi.skyline(df.where($"id" <= 1), Seq("v1", "v2")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("sky_dominates SQL function via runtime registration") {
    val s2 = spark
    SkylineExtensions.register(s2)
    locally {
      val r = s2.sql(
        """SELECT sky_dominates(array(1.0D, 2.0D), array(2.0D, 2.0D)) AS d1,
          |       sky_dominates(array(2.0D, 2.0D), array(2.0D, 2.0D)) AS d2,
          |       sky_dominates(array(3.0D, 1.0D), array(1.0D, 3.0D)) AS d3
          |""".stripMargin).collect().head
      assert(r.getBoolean(0))      // strictly better in one dim
      assert(!r.getBoolean(1))     // duplicates never dominate
      assert(!r.getBoolean(2))     // incomparable
    }
  }

  test("extensions-class path injects the full function surface") {
    // the config-loaded path (spark.sql.extensions) must register the same
    // catalog as runtime register(); apply() on a fresh extensions object
    // exercises every injection site's builder wiring
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new SkylineExtensions().apply(ext)   // throws on any malformed triple
    // the composite builders shared by both paths evaluate correctly
    import org.apache.spark.sql.graftbridge.ColumnBridge.column
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    def arr(xs: Double*) =
      CreateArray(xs.map(x => Literal(x): org.apache.spark.sql.catalyst.expressions.Expression))
    val r = spark.range(1).select(
      column(SkylineExtensions.cosineExpr(arr(1.0, 0.0), arr(1.0, 0.0))).as("c1"),
      column(SkylineExtensions.cosineExpr(arr(1.0, 0.0), arr(0.0, 1.0))).as("c0"),
      column(SkylineExtensions.hash60ExprPublic(Literal("42"))).as("h"))
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    // hash60("42") = first 15 hex chars of md5("42") as a long — recompute
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("42".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    assert(r.getLong(2) == java.lang.Long.parseLong(hex, 16))
  }

  test("dominance expression matches the kernel on random vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val rows = Seq.fill(500)(
      (Array.fill(3)(rng.nextInt(5).toDouble), Array.fill(3)(rng.nextInt(5).toDouble)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.DominanceExpressions.dominates(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))).as[Boolean].collect()
    rows.zip(got).foreach { case ((a, b), g) =>
      assert(g == Dominance.dominates(a, b))
    }
  }
}
