package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SkylineOps, SparkTestSession}

/** Distribution replication tests (reference PDF §5.1 structural
  * expectations): skyline size ordering anti-correlated > correlated >
  * uniform, determinism across partitionings. */
class GeneratorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("skyline size ordering: anti-correlated > correlated > uniform") {
    val sizes = Seq("anti-correlated", "correlated", "uniform").map { d =>
      d -> SkylineOps.skyline(Generators.generate(spark, d, 20000, 2)).count()
    }.toMap
    assert(sizes("anti-correlated") > sizes("correlated"))
    assert(sizes("correlated") > sizes("uniform"))
    assert(sizes("uniform") < 100)
  }

  test("generation is deterministic and partition-independent") {
    val a = Generators.generate(spark, "correlated", 500, 3).collect()
      .sortBy(_.id).map(p => (p.id, p.values.toSeq))
    val b = Generators.generate(spark, "correlated", 500, 3)
      .repartition(7).collect().sortBy(_.id).map(p => (p.id, p.values.toSeq))
    assert(a.sameElements(b))
  }

  test("values stay in domain; correlated points hug the diagonal") {
    val pts = Generators.generate(spark, "correlated", 2000, 2,
      dMin = 0, dMax = 1000).collect()
    assert(pts.forall(_.values.forall(v => v >= 0 && v <= 1000)))
    val avgSpread = pts.map(p => math.abs(p.values(0) - p.values(1))).sum / pts.length
    assert(avgSpread < 200)   // ρ=0.9 noise band ⇒ tight diagonal
  }
}
