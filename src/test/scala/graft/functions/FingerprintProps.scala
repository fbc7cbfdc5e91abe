package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generative properties for the native fingerprint expressions, evaluated
  * directly (no Spark session): each must equal an independent brute-force
  * reimplementation on arbitrary strings (small alphabets force hash ties;
  * a few multibyte chars exercise UTF-8), and winnowing must honor its
  * guarantee — any shared substring of length >= w+k-1 yields a shared
  * fingerprint. */
object FingerprintProps extends Properties("Fingerprints") {

  private val K = 4
  private val W = 3
  private val NumHashes = 6

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) >>> 4
  }

  private def grams(s: String, k: Int): Seq[String] =
    if (s.length < k) Seq(s)
    else (0 to s.length - k).map(i => s.substring(i, i + k))

  private val genText: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é', '界', ' '))
  } yield cs.mkString

  // --- minhash -----------------------------------------------------------
  private def bruteSig(s: String): Seq[Long] = {
    val hs = grams(s, K).map(g => hash60(g) % MinhashP)
    (0 until NumHashes).map(i =>
      hs.map(h => (minhashA(i) * h + minhashB(i)) % MinhashP).min)
  }

  property("minhash sig matches brute force") = forAll(genText) { s =>
    val got = MinhashSigExpr(null, K, NumHashes)
      .nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[GenericArrayData].array.toSeq.map(_.asInstanceOf[Long])
    got == bruteSig(s)
  }

  // --- simhash -----------------------------------------------------------
  private def bruteSimhash(s: String): Long = {
    val toks = s.split(" ", -1).distinct
    val hs = toks.map(hash60)
    (0 until 60).foldLeft(0L) { (acc, b) =>
      if (hs.count(h => ((h >>> b) & 1L) == 1L) * 2 > hs.length)
        acc | (1L << b)
      else acc
    }
  }

  property("simhash matches brute force") = forAll(genText) { s =>
    SimhashExpr(null).nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[Long] == bruteSimhash(s)
  }

  // --- winnowing ---------------------------------------------------------
  private def bruteWinnow(s: String): Seq[(Long, Long)] = {
    val hs = grams(s, K).map(hash60)
    val ww = if (hs.length < W) hs.length else W
    (0 to hs.length - ww).flatMap { s0 =>
      val window = (s0 until s0 + ww).map(p => (hs(p), p))
      val sel = window.minBy { case (h, p) => (h, -p) } // rightmost min
      Seq(((sel._2 + 1).toLong, sel._1))
    }.distinct
  }

  private def evalWinnow(s: String): Seq[(Long, Long)] = {
    val arr = WinnowExpr(null, K, W).nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[GenericArrayData]
    (0 until arr.numElements).map { i =>
      val r = arr.array(i).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (r.getLong(0), r.getLong(1))
    }
  }

  property("winnow matches brute force") = forAll(genText) { s =>
    evalWinnow(s) == bruteWinnow(s)
  }

  property("winnow guarantee: shared substring >= w+k-1 shares a fingerprint") =
    forAll(
      Gen.listOfN(W + K - 1 + 3, Gen.oneOf('a', 'b', 'c')).map(_.mkString),
      genText, genText) { (common, pre, post) =>
      val fp1 = evalWinnow(pre + common).map(_._2).toSet
      val fp2 = evalWinnow(common + post).map(_._2).toSet
      fp1.intersect(fp2).nonEmpty
    }
}
