package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Floors and structural laws for the tracked ANN approximation quality
  * (ann_recall). Exact values are gated by the DuckDB oracle; these pin
  * the QUALITY so an approximation regression (bucket hash change, probe
  * loss, centroid drift) fails tests instead of silently shipping worse
  * neighbors. Floors are the measured fixture values (sf0.001: ivf 4–8,
  * lsh 1–2, lsh_mp 1–5 hits of 10) minus nothing — they are the current
  * worst case, so any drop is a real regression. */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    graft.SparkEntry.queries("ann_recall")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("every (method, query) pair is present with hits in [0, 10]") {
    val methods = Seq("ivf", "lsh", "lsh_mp", "pq", "pq_ivf")
    assert(rows.keySet == (for (m <- methods; q <- 0L to 4L) yield (m, q)).toSet)
    assert(rows.values.forall(h => h >= 0L && h <= 10L))
  }

  test("pq finds the self-hit for every query") {
    // PQ ranks reconstructed vectors — the query's own (reconstructed)
    // vector stays near the query unless the codebook collapsed
    for (q <- 0L to 4L)
      assert(rows(("pq", q)) >= 1L, s"pq lost the self-hit for query $q")
  }

  test("recall floors: ivf >= 40%, lsh and lsh_mp find at least the self-hit") {
    for (q <- 0L to 4L) {
      assert(rows(("ivf", q)) >= 4L, s"ivf recall dropped for query $q")
      assert(rows(("lsh", q)) >= 1L, s"lsh lost the self-hit for query $q")
      assert(rows(("lsh_mp", q)) >= 1L, s"lsh_mp lost the self-hit for query $q")
    }
  }

  test("multi-probe never recalls fewer exact neighbors than single-probe") {
    // provable, not empirical: lsh_mp's candidate set is a superset of
    // lsh's (mask 0 = the own bucket), and any candidate that displaces an
    // exact-top-10 member from the approximate top-10 has a higher cosine,
    // hence is itself an exact-top-10 member — hits cannot decrease
    for (q <- 0L to 4L)
      assert(rows(("lsh_mp", q)) >= rows(("lsh", q)),
        s"multi-probe lost recall vs single-probe for query $q")
  }

  test("multi-probe lifts aggregate recall strictly on the fixture") {
    val mp = (0L to 4L).map(q => rows(("lsh_mp", q))).sum
    val sp = (0L to 4L).map(q => rows(("lsh", q))).sum
    assert(mp > sp, s"expected a strict aggregate lift, got $sp -> $mp")
  }
}
