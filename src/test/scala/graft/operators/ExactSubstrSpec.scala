package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ExactSubstr dedup (Lee et al. 2022 semantics, span-hash formulation):
  * any >= k-token run already present in an earlier document must be fully
  * covered (all its positions), runs shorter than k must never match, and
  * excision must remove exactly the covered positions. The second suite
  * checks the whole operator against a driver-side brute-force
  * recomputation on a random small-vocab corpus where natural duplicate
  * spans arise by chance. */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val K = 8

  private def run(rows: Seq[(Long, String)], clean: Boolean = true) = {
    import spark.implicits._
    Dedup.exactSubstrStats(rows.toDF("doc_id", "text"), "doc_id", "text",
        k = K, clean = clean)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          if (clean) r.getString(5) else "")).toMap
  }

  test("planted 12-token run: owner untouched, copier covered and excised") {
    val shared = (1 to 12).map(i => s"s$i")
    val d0 = (0 to 4).map(i => s"u0_$i") ++ shared ++ (5 to 9).map(i => s"u0_$i")
    val d1tail = (3 to 7).map(i => s"u1_$i")
    val d1 = (0 to 2).map(i => s"u1_$i") ++ shared ++ d1tail
    val d2 = (0 to 19).map(i => s"u2_$i")
    // only 7 shared tokens — one short of a k-span, must not match
    val d3 = shared.take(7) ++ (0 to 12).map(i => s"u3_$i")
    val out = run(Seq(0L -> d0, 1L -> d1, 2L -> d2, 3L -> d3)
      .map { case (id, ws) => (id, ws.mkString(" ")) })
    assert(out(0L) === ((22L, 0L, 0L, 0.0, d0.mkString(" "))))
    // run at positions 3..14: span starts 3..7 (5 spans), 12 covered
    assert(out(1L)._2 === 5L)
    assert(out(1L)._3 === 12L)
    assert(out(1L)._4 === 12.0 / 20.0)
    assert(out(1L)._5 === ((0 to 2).map(i => s"u1_$i") ++ d1tail).mkString(" "))
    assert(out(2L) === ((20L, 0L, 0L, 0.0, d2.mkString(" "))))
    assert(out(3L)._2 === 0L)
  }

  test("short and empty documents pass through with zero spans") {
    val out = run(Seq(0L -> "a b c d e f g h", 1L -> "a b c", 2L -> ""))
    assert(out(1L) === ((3L, 0L, 0L, 0.0, "a b c")))
    assert(out(2L) === ((0L, 0L, 0L, 0.0, "")))
  }

  test("matches driver-side brute force on a random small-vocab corpus") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val docs = Seq.tabulate(30) { i =>
      (i.toLong, Vector.fill(15 + rng.nextInt(25))(vocab(rng.nextInt(4))))
    }
    // brute force over span STRINGS (the operator hashes them; identical
    // results unless xxhash64 collides, which this would surface)
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    for ((id, ws) <- docs; p <- 0 to ws.length - K)
      firstDoc.updateWith(ws.slice(p, p + K).mkString(" ")) {
        case Some(o) => Some(math.min(o, id)); case None => Some(id)
      }
    val expected = docs.map { case (id, ws) =>
      val dps = (0 to ws.length - K).filter(p =>
        firstDoc(ws.slice(p, p + K).mkString(" ")) < id)
      val cov = dps.flatMap(p => p until p + K).distinct.sorted
      id -> ((ws.length.toLong, dps.length.toLong, cov.length.toLong,
        if (ws.isEmpty) 0.0 else cov.length.toDouble / ws.length,
        ws.zipWithIndex.collect {
          case (w, i) if !cov.contains(i) => w }.mkString(" ")))
    }.toMap
    assert(expected.values.exists(_._2 > 0),
      "fixture must produce natural duplicate spans")
    val out = run(docs.map { case (id, ws) => (id, ws.mkString(" ")) })
    assert(out === expected)
  }
}
