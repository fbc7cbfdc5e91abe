package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** The runtime-registered SQL functions added in round 7 must be bit-equal
  * to their Column-API counterparts — the same parity law the rest of the
  * graft_* surface satisfies (sql_functions oracle). Both registration
  * paths share one builder, so testing the runtime path covers the
  * extensions-class path's expression construction too. */
class SqlFunctionParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graft_minhash_sig and graft_classifier_sum match the Column API") {
    import spark.implicits._
    SkylineExtensions.register(spark)
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, ""),
      (2L, "ab"),
      (3L, "Ünïcode tëxt with ümlauts and the the the"),
      (4L, "numbers 123 drop but letters stay"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("parity_docs")

    val weights = (0 until 16).map(i => (i * 37 - 250).toLong)
    val weightsSql = weights.mkString("array(", "L, ", "L)")

    val sqlSide = spark.sql(
      s"""SELECT id,
         |  graft_minhash_sig(regexp_replace(lower(trim(text)), '\\\\s+', ' '),
         |    5, 4) AS sig,
         |  graft_classifier_sum(regexp_extract_all(lower(text), '[a-z]+', 0),
         |    $weightsSql) AS wsum
         |FROM parity_docs ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))

    val colSide = docs.select(col("id"),
        graft.functions.MinhashExpressions
          .minhashSigNative(graft.functions.normText(col("text")), 5, 4)
          .as("sig"),
        graft.functions.TextExpressions.classifierSumNative(
            regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)),
            weights)
          .as("wsum"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))

    assert(sqlSide.toSeq == colSide.toSeq)
    // and the weight sum is the plain-Scala fold it claims to be
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect4 = "[a-z]+".r
      .findAllIn("numbers 123 drop but letters stay".toLowerCase(
        java.util.Locale.ROOT))
      .map(t => weights((h60(s"clf#$t") % 16).toInt)).sum
    assert(colSide.find(_._1 == 4L).get._3 == expect4)
  }

  test("null array elements contribute nothing instead of NPE-ing") {
    SkylineExtensions.register(spark)
    val weights = (0 until 16).map(i => (i * 37 - 250).toLong)
    val weightsSql = weights.mkString("array(", "L, ", "L)")
    // graft_classifier_sum is SQL-registered: callers can hand it any
    // ARRAY<STRING>, including one with NULL elements — defined behavior is
    // "a null token adds 0", identical to the array with nulls removed
    val rows = spark.sql(
      s"""SELECT graft_classifier_sum(array('a', CAST(NULL AS STRING), 'b'),
         |         $weightsSql) AS with_null,
         |       graft_classifier_sum(array('a', 'b'), $weightsSql) AS no_null,
         |       graft_classifier_sum(array(CAST(NULL AS STRING)),
         |         $weightsSql) AS only_null,
         |       graft_classifier_sum(CAST(NULL AS ARRAY<STRING>),
         |         $weightsSql) AS null_input""".stripMargin)
      .collect()(0)
    assert(rows.getLong(0) == rows.getLong(1))
    assert(rows.getLong(2) == 0L)
    assert(rows.isNullAt(3))
  }

  test("non-literal weight argument is rejected loudly") {
    SkylineExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_classifier_sum(array('a'), array(id)) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("foldable array literal") ||
      Option(e.getCause).exists(_.getMessage.contains("foldable array literal")))
  }
}
