package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pigeonhole-banded Hamming join must return EXACTLY the all-pairs
  * join's result (candidate pruning, never a semantics change) for every
  * radius its block count covers — and the block decomposition must stay
  * lossless when 60 % blocks != 0 (the last block absorbs the remainder).
  */
class SimhashPairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture = {
    val rng = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsi", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    def doc(n: Int): String =
      Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(50)(i => (i.toLong, doc(30 + rng.nextInt(40))))
    // planted: append one token (tiny vote shift -> small hamming for
    // long docs), plus exact copies (hamming 0)
    val near = base.take(15).map { case (id, t) => (id + 100, t + " rho") }
    val same = base.slice(15, 25).map { case (id, t) => (id + 200, t) }
    import spark.implicits._
    (base ++ near ++ same).toDF("doc_id", "text")
  }

  private def bruteForce(maxHamming: Int): Set[(Long, Long, Long)] = {
    val sh = Dedup.simhash(fixture, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (ia, ha) <- sh; (ib, hb) <- sh
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= maxHamming
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb).toLong)).toSet
  }

  // d=3 -> 4x15-bit blocks (the catalog geometry); d=2 -> 3x20; d=4 ->
  // 5x12; d=6 -> 7 blocks of 8 with a 12-bit remainder block; d=0 ->
  // exact-equality join degenerate case
  for (d <- Seq(0, 2, 3, 4, 6))
    test(s"banded Hamming join equals all-pairs at d=$d") {
      val got = Dedup.simhashHammingPairs(fixture, "doc_id", "text", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteForce(d))
      if (d >= 3) assert(got.nonEmpty) // planted dups must surface
    }

  test("exact copies land at hamming 0 and appended-token copies are close") {
    val got = Dedup.simhashHammingPairs(fixture, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- 15L until 25L) assert(got((i, i + 200)) == 0L)
  }

  test("null and empty texts do not join against everything") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsi zeta eta theta"),
      (2L, "alpha beta gamma delta epsi zeta eta theta"),
      (3L, null.asInstanceOf[String]), (4L, ""), (5L, "")).toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // null text drops entirely; the two empty docs pair with each other
    // (identical signature) but not with the real documents
    assert(got == Set((1L, 2L), (4L, 5L)))
  }

  test("maxBlockFreq cap only ever removes pairs, never invents them") {
    val capped = Dedup
      .simhashHammingPairs(fixture, "doc_id", "text", 3, maxBlockFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped.subsetOf(bruteForce(3)))
  }
}

/** The validation suite: counts, null semantics, quarantine complement. */
class ValidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some(5.0), "A"),   // clean
      (2L, Some(500.0), "A"), // qty out of range
      (3L, None, "N"),        // null qty -> violation (unknown != valid)
      (4L, Some(5.0), "X"),   // bad flag
      (5L, Some(-1.0), "X")   // two violations
    ).toDF("id", "qty", "flag")
  }

  private val rules = Seq(
    ("flag_domain", col("flag").isin("A", "N")),
    ("qty_range", col("qty").between(0.0, 100.0)))

  test("checkRules counts violations with null-as-violation semantics") {
    val got = Validate.checkRules(fixture, rules).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("flag_domain", 2L, 5L, false),
      ("qty_range", 3L, 5L, false)))
  }

  test("checkRules reports ok=true for a satisfied rule") {
    val got = Validate.checkRules(fixture, Seq(("id_pos", col("id") > 0L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(got.toSeq == Seq(("id_pos", 0L, true)))
  }

  test("quarantine returns exactly the violating rows, suite-ordered tags") {
    val got = Validate.quarantine(fixture, rules, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(
      2L -> "qty_range", 3L -> "qty_range", 4L -> "flag_domain",
      5L -> "flag_domain,qty_range"))
  }

  test("quarantine + clean split partitions the table") {
    val n = fixture.count()
    val bad = Validate.quarantine(fixture, rules, Seq("id")).count()
    assert(bad == 4 && n == 5)
  }

  test("kAnonymityAudit flags exactly the classes below k") {
    import spark.implicits._
    val df = (Seq.fill(5)(("us", "a")) ++ Seq.fill(2)(("us", "b")) ++
      Seq.fill(3)(("de", "a"))).toDF("country", "seg")
    val got = Validate.kAnonymityAudit(df, Seq("country", "seg"), 3)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(("us", "a") -> ((5L, false)),
      ("us", "b") -> ((2L, true)), ("de", "a") -> ((3L, false))))
  }

  test("contentManifest is row-order free and change-sensitive") {
    import spark.implicits._
    val a = Seq((0L, "x"), (64L, "y"), (1L, "z")).toDF("id", "t")
    val b = Seq((1L, "z"), (64L, "y"), (0L, "x")).toDF("id", "t") // shuffled
    val c = Seq((0L, "x"), (64L, "Y"), (1L, "z")).toDF("id", "t") // mutated
    def m(df: org.apache.spark.sql.DataFrame) =
      Validate.contentManifest(df, "id",
          org.apache.spark.sql.functions.col("t"), 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m(a) == m(b))                       // order never matters
    assert(m(a) != m(c))                       // one byte flips the bucket
    assert(m(a).map(_._1) == Set(0L, 1L))      // 0 and 64 share bucket 0
    assert(m(a).find(_._1 == 0L).get._2 == 2L) // xor folds both rows
  }
}
