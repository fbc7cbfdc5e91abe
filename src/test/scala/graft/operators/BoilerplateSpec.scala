package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Boilerplate removal: df-threshold delete + in-order reassembly. */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val banner = "please accept all cookies to continue reading this site now"
  private val bodies = Seq(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten",
    "red orange yellow green blue indigo violet cyan magenta black")

  test("segments shared by more than maxDf docs are deleted in place") {
    import spark.implicits._
    // banner is a full 10-token segment PREFIX in every doc; bodies unique
    val df = bodies.zipWithIndex
      .map { case (b, i) => (i.toLong, s"$banner $b") }
      .toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == bodies.zipWithIndex.map { case (b, i) =>
      (i.toLong, b, 1L, 2L)
    })
  }

  test("docs below the df threshold pass through verbatim") {
    import spark.implicits._
    val df = Seq((1L, bodies(0)), (2L, bodies(1))).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .orderBy("doc_id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq(bodies(0), bodies(1)))
    assert(got.map(r => (r.getLong(2), r.getLong(3))).forall(_ == (1L, 1L)))
  }

  test("a fully-boilerplate doc survives with empty clean_text") {
    import spark.implicits._
    val df = (Seq((10L, banner), (11L, banner), (12L, banner)) ++
      Seq((13L, bodies(0)))).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.take(3).forall { case (_, t, k, n) => t == "" && k == 0 && n == 1 })
    assert(got(3) == ((13L, bodies(0), 1L, 1L)))
  }

  test("reassembly preserves original segment order across many segments") {
    import spark.implicits._
    val words = (1 to 95).map(i => s"w$i").mkString(" ") // 10 segments, last short
    val df = Seq((1L, words)).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .collect().head
    assert(got.getString(1) == words)
    assert((got.getLong(2), got.getLong(3)) == ((10L, 10L)))
  }

  test("null and blank texts are dropped (no segments to audit)") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "  "), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 10, 2)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
  }
}

/** BPE pair counting: frequency weighting, 1-char words, case folding. */
class BpePairSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("adjacent pairs are weighted by corpus word frequency") {
    import spark.implicits._
    // 'abab' x2 and 'ab' x3: ab = 2*2 + 3 = 7, ba = 2, bb absent
    val df = Seq("abab ABAB ab", "ab Ab x").toDF("text")
    val got = TextAnalysis.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 7L, "ba" -> 2L))
  }

  test("single-letter words contribute nothing; ordering is count desc") {
    import spark.implicits._
    val df = Seq("a a a zz zz zy").toDF("text")
    val got = TextAnalysis.bpePairCounts(df, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("zz", 2L), ("zy", 1L)))
  }

  test("bpeLearnMerges is greedy left-to-right and merges across rounds") {
    import spark.implicits._
    // 'aaab' x3: round 1 pairs {a a: 6, a b: 3} -> merge 'a a' (greedy:
    // "a a a b" -> "aa a b", NOT "a aa b"); round 2 pairs over "aa a b"
    // tie at 3 ("aa a" vs "a b") -> pair-asc tiebreak picks "a b"
    // (space < 'a'); round 3 merges the remaining "aa ab".
    val df = Seq("aaab aaab aaab").toDF("text")
    val got = TextAnalysis.bpeLearnMerges(df, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "a a", 6L), (2L, "a b", 3L),
      (3L, "aa ab", 3L)))
  }

  test("bpeLearnMerges stops early when every word is fully merged") {
    import spark.implicits._
    val df = Seq("ab ab cd").toDF("text")
    val got = TextAnalysis.bpeLearnMerges(df, "text", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // round 1 merges 'a b' (weight 2), round 2 'c d' (weight 1); then
    // no 2-symbol words remain -> early stop after 2 of the 10 rounds
    assert(got.toSeq == Seq((1L, "a b", 2L), (2L, "c d", 1L)))
  }
}

/** Histogram-CDF rank blend: exact fraction-below semantics when values
  * spread across distinct bins; degenerate and blend invariants. */
class BlendRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions.col

  test("ranks equal exact fraction-below when each value has its own bin") {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val got = TextAnalysis.blendQualityRanks(df, "id",
        Seq("v" -> col("v")), bins = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // value i has exactly i rows strictly below -> rank i/10 in u6
    for (i <- 0 until 10) assert(got(i.toLong) == i * 100000L)
  }

  test("blend of two identical signals equals the single-signal rank") {
    import spark.implicits._
    val df = (0 until 8).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val got = TextAnalysis.blendQualityRanks(df, "id",
        Seq("a" -> col("v"), "b" -> col("v")), bins = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.foreach { case (_, ra, rb, blend) =>
      assert(ra == rb && blend == ra)
    }
  }

  test("null signals keep the old fold's semantics exactly (r15)") {
    // The r15 shared-pass rewrite must reproduce the old per-signal fold
    // bit-for-bit, including its null quirk: histBin(null) = least(bins-1,
    // null) = the TOP bin (least skips nulls), so a null-signal row is
    // binned 511, counted in the histogram, survives every join, and
    // takes the top bin's rank — while count(v) still excludes it from
    // _n. Hand-computed for the 4-row fixture (verified against the
    // pre-r15 fold implementation):
    //   a: lo=1 hi=4 n=3; bins 0/170/511/511 -> below 0/1/2/2
    //   b: lo=10 hi=40 n=3; bins 0/511/341/511 -> below 0/2/1/2
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.0), Some(10.0)), (2L, Some(2.0), None),
      (3L, Option.empty[Double], Some(30.0)), (4L, Some(4.0), Some(40.0)))
      .toDF("id", "a", "b")
    val got = TextAnalysis.blendQualityRanks(df, "id",
        Seq("a" -> col("a"), "b" -> col("b")), bins = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L),
      (2L, 333333L, 666666L, 499999L),
      (3L, 666666L, 333333L, 499999L),
      (4L, 666666L, 666666L, 666666L)))
  }

  test("constant signal degenerates to rank 0 for every row") {
    import spark.implicits._
    val df = (0 until 5).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val got = TextAnalysis.blendQualityRanks(df, "id",
        Seq("v" -> col("v")), bins = 512)
      .collect().map(_.getLong(1))
    assert(got.forall(_ == 0L))
  }
}

/** Robust MAD outliers: discrete lower medians, degenerate-MAD guard. */
class MadOutlierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("lower-median MAD flags only far points and skips zero-MAD groups") {
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    import spark.implicits._
    // group a: values 1..9 + outlier 100 (med=5 over 10 rows -> rank 5,
    // devs {0..4,95}, mad=lower-median=2, threshold 6 -> only 100 flagged)
    // group b: constant -> mad 0 -> no flags even for identical values
    val rows = (1 to 9).map(i => (i.toLong, "a", i.toDouble)) ++
      Seq((10L, "a", 100.0)) ++ (11 to 15).map(i => (i.toLong, "b", 7.0))
    rows.toDF("event_id", "event_type", "value")
      // the shared events loader requires a ts column (fixture schema)
      .withColumn("ts",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.lit("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.RelationalQueries.queries("events_mad_outliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    graft.IoUtil.deleteRecursively(dir)
    assert(got.toSeq == Seq((10L, "a", 100.0)))
  }
}
