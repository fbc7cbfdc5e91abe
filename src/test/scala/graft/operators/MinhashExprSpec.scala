package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** The native one-pass MinHash signature must equal the relational
  * explode+groupBy formulation it replaced — including the edge cases the
  * parquet fixture doesn't exercise: empty text, text shorter than the
  * shingle width, repeated shingles, and multibyte (BMP) characters. */
class MinhashExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val NumHashes = 8

  /** The pre-round-5 formulation, kept as the reference implementation. */
  private def relationalSig(df: org.apache.spark.sql.DataFrame) = {
    val sh = df.select(col("id"), explode(charShingles(col("text"), 5)).as("shingle"))
    val withBase = sh.withColumn("_h", hash60(col("shingle")) % MinhashP)
    val hs = (0 until NumHashes).map(k =>
      min((lit(minhashA(k)) * col("_h") + lit(minhashB(k))) % MinhashP).as(s"h$k"))
    withBase.groupBy(col("id")).agg(hs.head, hs.tail: _*)
  }

  test("native signature equals explode+groupBy on edge-case corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, ""),                          // empty -> single "" shingle
      (1L, "ab"),                        // shorter than k -> whole-text shingle
      (2L, "aaaaaaaaaaaa"),              // one repeated shingle
      (3L, "héllo wörld, straße 世界"), // BMP multibyte
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "  The   QUICK  brown fox  ") // normalization must fold case/space
    ).toDF("id", "text")
    val got = Dedup.minhashSignatures(docs, "id", "text", k = 5, numHashes = NumHashes)
      .orderBy("id").collect().map(_.toSeq)
    val want = relationalSig(docs).orderBy("id").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  /** The pre-round-5 SimHash formulation, kept as the reference. */
  private def relationalSimhash(df: org.apache.spark.sql.DataFrame) = {
    val toks = df.select(col("id"),
      explode(split(normText(col("text")), " ")).as("tok"))
      .dropDuplicates("id", "tok")
      .withColumn("h", hash60(col("tok")))
    val bitCols = (0 until 60).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1)).as(s"c$b"))
    val counted = toks.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), bitCols: _*)
    val sig = (0 until 60).map(b =>
      when(col(s"c$b") * 2 > col("n"), shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    counted.select(col("id"), sig.as("simhash"))
  }

  test("native simhash equals explode+vote groupBy on edge-case corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, ""),                           // empty -> single "" token
      (1L, "tok"),                        // one token: all its bits win
      (2L, "a a a b"),                    // duplicates must count once
      (3L, "héllo wörld straße 世界 héllo"),
      (4L, "the quick brown fox the lazy dog"),
      (5L, "  MIXED   Case   mixed  ")    // normalization folds case/space
    ).toDF("id", "text")
    val got = Dedup.simhash(docs, "id", "text").orderBy("id").collect().toSeq
    val want = relationalSimhash(docs).orderBy("id").collect().toSeq
    assert(got === want)
  }

  test("winnowing equals brute-force window enumeration, incl. hash ties") {
    import spark.implicits._
    val k = 4; val w = 3
    val rng = new scala.util.Random(7)
    // 2-letter alphabet -> repeated grams -> identical hashes, exercising
    // the rightmost-min tie-break; plus the short/empty degenerate cases
    val texts = Seq("", "ab", "aaaaaaaaaa") ++
      Seq.fill(20)(Seq.fill(rng.nextInt(30) + 1)(
        if (rng.nextBoolean()) 'a' else 'b').mkString)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")

    def brute(t: String): Seq[(Long, Long)] = {
      val n = t.trim.toLowerCase.replaceAll("\\s+", " ")
      val win = if (n.length < k) n.length else k
      val g = if (n.length < k) 1 else n.length - k + 1
      val hs = (0 until g).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(n.substring(i, i + win).getBytes("UTF-8"))
        (d.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))) >>> 4
      }
      val ww = if (g < w) g else w
      (0 to g - ww).flatMap { s0 =>
        val window = (s0 until s0 + ww).map(p => (hs(p), p))
        // rightmost minimum: smallest hash, largest pos among equals
        val sel = window.minBy { case (h, p) => (h, -p) }
        Seq(((sel._2 + 1).toLong, sel._1))
      }.distinct.sortBy(_._1)
    }

    val result = docs.select(col("id"),
        explode(graft.functions.MinhashExpressions
          .winnowNative(normText(col("text")), k, w)).as("f"))
      .select(col("id"), col("f.pos"), col("f.fp"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1) }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(result.getOrElse(i.toLong, Seq.empty) === brute(t),
        s"doc $i: '${t.take(20)}'")
    }
  }

  test("signature is a pure projection: plan has no shuffle") {
    import spark.implicits._
    val df = Seq((1L, "some document text here")).toDF("id", "text")
    val plan = Dedup.minhashSignatures(df, "id", "text")
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"expected shuffle-free signature plan:\n$plan")
    // the non-cheap _sig alias must be computed once, not inlined per hash
    // (CollapseProject would multiply the md5 work by numHashes)
    val nSigExprs = plan.toString.split("minhashsigexpr|MinhashSigExpr").length - 1
    assert(nSigExprs <= 1, s"MinhashSigExpr inlined $nSigExprs times:\n$plan")
  }
}
