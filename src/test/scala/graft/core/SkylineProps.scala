package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Generative property tests (SURVEY §5.2): the algebraic laws the two-phase
  * distributed skyline relies on, over arbitrary point sets — not just fixed
  * seeds. Runs under sbt's native ScalaCheck support.
  */
object SkylineProps extends Properties("Skyline") {

  private val genPoint: Gen[Point] = for {
    id <- Gen.chooseNum(0L, 1000L)
    dims <- Gen.chooseNum(1, 4)
    vs <- Gen.listOfN(dims, Gen.chooseNum(0, 15))
  } yield Point(id, vs.map(_.toDouble).toArray)

  /** Same arity for every point in a set (the engine contract). */
  private val genPoints: Gen[List[Point]] = for {
    dims <- Gen.chooseNum(1, 4)
    n <- Gen.chooseNum(0, 120)
    pts <- Gen.listOfN(n, Gen.listOfN(dims, Gen.chooseNum(0, 15)))
  } yield pts.zipWithIndex.map { case (vs, i) =>
    Point(i.toLong, vs.map(_.toDouble).toArray)
  }

  private def sky(pts: Seq[Point]): Set[(Long, Seq[Double])] =
    SkylineBuffer.of(pts.iterator).result.map(p => (p.id, p.values.toSeq)).toSet

  private def brute(pts: Seq[Point]): Set[(Long, Seq[Double])] =
    pts.filter(t => !pts.exists(u => Dominance.dominates(u.values, t.values)))
      .map(p => (p.id, p.values.toSeq)).toSet

  property("matches brute force") = forAll(genPoints) { pts =>
    sky(pts) == brute(pts)
  }

  property("antichain") = forAll(genPoints) { pts =>
    val s = SkylineBuffer.of(pts.iterator).result
    s.forall(a => s.forall(b => !Dominance.dominates(a.values, b.values)))
  }

  property("idempotent") = forAll(genPoints) { pts =>
    val once = SkylineBuffer.of(pts.iterator).result
    sky(once) == once.map(p => (p.id, p.values.toSeq)).toSet
  }

  property("distributive over union (any split)") =
    forAll(genPoints, Gen.chooseNum(0, 100)) { (pts, cut) =>
      val (a, b) = pts.splitAt(cut % (pts.length + 1))
      val whole = sky(pts)
      val merged = sky(SkylineBuffer.of(a.iterator).result ++
        SkylineBuffer.of(b.iterator).result)
      whole == merged
    }

  property("insertion-order insensitive") = forAll(genPoints) { pts =>
    sky(pts) == sky(pts.reverse)
  }

  property("merge == bulk build") = forAll(genPoints, genPoints) { (a0, b0) =>
    // align arities: merge contract assumes one arity per stream
    val d = a0.headOption.map(_.values.length).getOrElse(2)
    val b = b0.map(p => Point(p.id + 10000L,
      Array.tabulate(d)(i => p.values(i % p.values.length))))
    val bufA = SkylineBuffer.of(a0.iterator)
    val bufB = SkylineBuffer.of(b.iterator)
    val merged = bufA.merge(bufB).result.map(p => (p.id, p.values.toSeq)).toSet
    merged == sky(a0 ++ b)
  }

  property("dominance is a strict partial order") =
    forAll(genPoint, genPoint, genPoint) { (a, b, c) =>
      val irrefl = !Dominance.dominates(a.values, a.values)
      val asym = !(Dominance.dominates(a.values, b.values) &&
        Dominance.dominates(b.values, a.values))
      val trans = !(Dominance.dominates(a.values, b.values) &&
        Dominance.dominates(b.values, c.values)) ||
        Dominance.dominates(a.values, c.values)
      irrefl && asym && trans
    }
}
