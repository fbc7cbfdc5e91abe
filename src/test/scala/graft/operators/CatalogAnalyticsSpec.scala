package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariant checks for the round-3 analytics additions (funnel, retention,
  * latest-per-key, z-score, tf-idf, embedding quantization/centroids) over
  * the sf0.001 fixture — the exact-value gate is the DuckDB oracle; these
  * specs assert the structural laws that must hold regardless of data.
  */
class CatalogAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("events_funnel stages are monotonically non-increasing") {
    val rows = run("events_funnel").collect()
    assert(rows.length == 4)
    val counts = rows.sortBy(_.getString(0)).map(_.getLong(1))
    assert(counts.head > 0)
    counts.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("events_latest equals the brute-force last record per user") {
    val ev = graft.sources.EventsFixture.load(spark, dir)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
    val expect = ev.groupBy(_.getLong(0)).map { case (u, rs) =>
      val last = rs.maxBy(r => (r.getLong(1), r.getLong(2)))
      (u, last.getLong(2), last.getString(3), last.getDouble(4))
    }.toSet
    val got = run("events_latest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(got == expect)
  }

  test("events_retention cell (cohort, 0) equals the cohort size") {
    val rows = run("events_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, off, n) => off >= 0 && n > 0 })
    // at offset 0 every cohort member is active by definition, so the
    // offset-0 cell must be the largest cell of its cohort row
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val zero = cells.find(_._2 == 0L).map(_._3)
      assert(zero.isDefined)
      assert(cells.map(_._3).max == zero.get)
    }
  }

  test("events_zscore flags match a brute-force z computation") {
    val ev = graft.sources.EventsFixture.load(spark, dir)
      .select("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = ev.groupBy(_._2).flatMap { case (_, rs) =>
      val vs = rs.map(_._3)
      val n = vs.length.toDouble
      val mean = vs.sum / n
      val variance = vs.map(v => v * v).sum / n - mean * mean
      if (variance <= 0) Seq.empty[Long]
      else rs.filter(r => math.abs((r._3 - mean) / math.sqrt(variance)) > 2.0)
        .map(_._1).toSeq
    }.toSet
    val got = run("events_zscore").collect().map(_.getLong(0)).toSet
    // brute force sums doubles in row order while the query sums decimals —
    // flags can only differ if a |z| sits within float noise of 2.0, which
    // the fixture does not contain
    assert(got == expect)
  }

  test("dedup_segments matches a brute-force 20-token-window recompute") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim))
      .filter(_._2.nonEmpty)
    val segs = docs.flatMap { case (id, text) =>
      text.split("\\s+").grouped(20).map(w => (id, w.mkString(" ")))
    }
    val firstOwner = segs.groupBy(_._2).map { case (seg, rs) =>
      (seg, rs.map(_._1).min)
    }
    val expect = segs.groupBy(_._1).map { case (id, rs) =>
      (id, (rs.length.toLong, rs.count(r => firstOwner(r._2) < id).toLong))
    }
    val got = run("dedup_segments").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    assert(expect.values.exists(_._2 > 0), "no duplicate segments in fixture")
  }

  test("pack_sequences tiles each language stream without gaps or overlaps") {
    val rows = run("pack_sequences").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._2)
      assert(ordered.head._4 == 0L) // first doc starts the stream
      // each document starts exactly where the previous one ended
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._3)
        case _ => ()
      }
      // seq assignment is consistent with the start offset
      ordered.foreach { case (_, _, _, start, seq, off) =>
        assert(seq == start / 2048 && off == start % 2048)
      }
    }
    // the corpus actually spans multiple sequences per language
    assert(rows.groupBy(_._1).values.forall(_.map(_._5).distinct.length > 1))
  }

  test("hist_quantiles estimates sit within one bin width of exact percentiles") {
    val vals = graft.sources.EventsFixture.load(spark, dir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val lo = vals.map(_._2).min
    val hi = vals.map(_._2).max
    val width = (hi - lo) / 512.0
    val got = run("hist_quantiles").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    vals.groupBy(_._1).foreach { case (typ, rs) =>
      val sorted = rs.map(_._2).sorted
      val (n, p50, p90, p99) = got(typ)
      assert(n == rs.length)
      // lower-bin-edge estimate: within one bin width below the exact rank
      // value (and never above it by more than a width)
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (q, est) =>
        val exact = sorted(math.ceil(q * sorted.length).toInt - 1)
        assert(est <= exact + width && est >= exact - width,
          s"$typ q=$q est=$est exact=$exact width=$width")
      }
    }
  }

  test("mix_weights: temperature flattens shares toward uniform, rates cap at 1") {
    val rows = run("mix_weights").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9) // raw shares sum to 1
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4) // temp shares too (quantized)
    // sqrt-temperature moves every share TOWARD the mean: above-average
    // sources shrink, below-average sources grow
    val mean = 1.0 / rows.length
    rows.foreach { case (src, share, temp, rate) =>
      if (share > mean + 1e-6) assert(temp < share, s"$src should shrink")
      if (share < mean - 1e-6) assert(temp > share, s"$src should grow")
      assert(rate > 0 && rate <= 1.0)
    }
  }

  test("events_scd2 intervals tile each user's history exactly") {
    val nEvents = graft.sources.EventsFixture.load(spark, dir).count()
    val rows = run("events_scd2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.length == nEvents) // one interval per change-log record
    rows.groupBy(_._1).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(i => (i._3, i._2))
      // exactly the last interval is open-ended
      assert(sorted.init.forall(_._4.isDefined) && sorted.last._4.isEmpty)
      // each interval closes exactly where the next one opens
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ => ()
      }
    }
  }

  test("emb_quantize codes span [0, 255] for non-constant vectors") {
    val dims = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    val rows = run("emb_quantize").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (qMin, qMax, nZero) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(qMin == 0)            // the min element maps to 0
      // the max element maps to floor of ~255.0 — IEEE evaluation of
      // fl(fl(255·d)/d) can land two ulps under 255 and floor to 254, so
      // 254 is legal (both engines agree; oracle parity is the exact gate)
      assert(qMax == 255 || qMax == 254)
      assert(nZero >= 1)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 255L * dims)
    }
  }

  test("emb_centroids matches the naive per-label mean within Q30 quantization") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val got = run("emb_centroids").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
      .toMap
    val byLabel = emb.groupBy(_._1)
    byLabel.foreach { case (label, vecs) =>
      val dims = vecs.head._2.length
      (0 until dims).foreach { d =>
        val xs = vecs.map(_._2(d).toDouble)
        val naive = xs.sum / xs.length
        val (centroid, n) = got((label, d.toLong))
        assert(n == vecs.length)
        // Q30 floor quantization biases each element by < 2^-30
        assert(math.abs(centroid - naive) < 1e-8,
          s"label=$label pos=$d got=$centroid naive=$naive")
      }
    }
  }

  test("basket_pairs matches brute-force co-occurrence counting") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val expect = li.groupBy(_._1).values.flatMap { items =>
      val pks = items.map(_._2).sorted
      for (i <- pks.indices; j <- i + 1 until pks.length if pks(i) != pks(j))
        yield (pks(i), pks(j))
    }.groupBy(identity).map { case (p, o) => (p._1, p._2, o.size.toLong) }
      .filter(_._3 >= 2).toSet
    val got = run("basket_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("events_rolling_7d frame matches a brute-force range scan") {
    val ev = graft.sources.EventsFixture.load(spark, dir)
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000000000L,
        BigDecimal(r.getDouble(3)).setScale(3, BigDecimal.RoundingMode.HALF_UP)))
    val got = run("events_rolling_7d").collect()
      .map(r => (r.getLong(0), (r.getDouble(2), r.getLong(3)))).toMap
    val byUser = ev.groupBy(_._2)
    ev.foreach { case (id, u, sec, _) =>
      val frame = byUser(u).filter(e => e._3 <= sec && e._3 >= sec - 604800L)
      val (sumGot, nGot) = got(id)
      assert(nGot == frame.length)
      assert(math.abs(sumGot - frame.map(_._4).sum.toDouble) < 1e-6)
    }
  }

  test("nation_revenue_share sums to 1 and is consistent with revenue") {
    val rows = run("nation_revenue_share").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    val total = rows.map(_._2).sum
    rows.foreach { case (_, rev, share) =>
      assert(math.abs(share - rev / total) < 1e-9)
    }
  }

  test("part_above_brand_avg keeps exactly the strictly-above-average parts") {
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_brand", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val avg = parts.groupBy(_._2).map { case (b, ps) =>
      (b, ps.map(p => BigDecimal(p._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / ps.length)
    }
    val expect = parts.filter { case (_, b, price) => price > avg(b) }
      .map(_._1).toSet
    val got = run("part_above_brand_avg").collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("distinct_sketch: linear-counting estimate tracks the exact count") {
    val rows = run("distinct_sketch").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val m = 256.0
    rows.foreach { case (typ, exact, occupied) =>
      assert(occupied <= exact && occupied <= 256)
      val est = -m * math.log((m - occupied) / m)
      assert(math.abs(est - exact) / exact < 0.15,
        s"$typ est=$est exact=$exact")
    }
  }

  test("graph_pagerank conserves rank mass and favors high-degree nodes") {
    val rows = run("graph_pagerank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0))
    // total rank mass stays ~1 (Q30 floors leak < |E|·2^-30 per round)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3)
    // ranking follows degree on this near-regular bipartite graph: the
    // top-decile-degree nodes must all outrank the bottom decile
    val byDeg = rows.sortBy(_._3)
    val lo = byDeg.take(rows.length / 10).map(_._2).max
    val hi = byDeg.takeRight(rows.length / 10).map(_._2).min
    assert(hi > lo)
  }

  test("graph_pagerank_digraph conserves mass with every supplier a sink") {
    val rows = run("graph_pagerank_digraph").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the directed trade graph: customers (even ids) all have out-edges,
    // suppliers (odd ids) are all sinks — deg must encode exactly that
    assert(rows.forall { case (id, _, deg) =>
      if (id % 2 == 0) deg > 0 else deg == 0 })
    // dangling redistribution keeps total mass ~1 despite every supplier
    // being a sink (without it ~half the mass would leak per round)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3)
    assert(rows.forall(_._2 > 0))
    // suppliers receive contributions on top of base+dangling share;
    // customers (no in-edges) get exactly the shared floor — so every
    // customer rank equals every other customer rank, below any supplier
    val (cust, supp) = rows.partition(_._1 % 2 == 0)
    assert(cust.map(_._2).distinct.length == 1)
    assert(supp.map(_._2).min > cust.head._2)
  }

  test("pageRank rejects digraphs with dangling vertices loudly") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 3 is a sink
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Graph.pageRank(edges, iterations = 1)
    }
    assert(ex.getMessage.contains("pageRankDigraph"))
  }

  test("pageRankDigraph matches hand-computed ranks on a 3-node chain") {
    import spark.implicits._
    // 1 → 2 → 3: node 3 is a sink, node 1 has no in-edges
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = graft.operators.Graph.pageRankDigraph(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val Q = 1073741824.0
    val n = 3.0
    val base = (1.0 - 0.85) / n
    val dq = math.floor((1.0 / n) * Q) // sink 3 held 1/3
    val dShare = 0.85 * (dq / Q) / n
    val contrib = math.floor((1.0 / n) / 1.0 * Q) // each edge carries 1/3
    assert(got(1L) == base + 0.85 * (0.0 / Q) + dShare)
    assert(got(2L) == base + 0.85 * (contrib / Q) + dShare)
    assert(got(3L) == base + 0.85 * (contrib / Q) + dShare)
  }

  test("cms_sketch rows each conserve the total term mass") {
    val rows = run("cms_sketch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.sorted.sameElements(0L to 3L))
    // every depth row hashes the same multiset of terms, so per-row sums
    // must agree (total number of counted tokens)
    val perRow = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).values.toSet
    assert(perRow.size == 1)
    assert(rows.forall(_._2 >= 0) && rows.forall(_._2 < 1024))
  }

  test("cms_estimate never underestimates (count-min law)") {
    val rows = run("cms_estimate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    rows.foreach { case (term, exact, est) =>
      assert(est >= exact, s"$term est=$est < exact=$exact")
    }
  }

  test("text_tfidf emits at most 3 ranked terms per doc with consistent df") {
    val rows = run("text_tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._6).sorted.sameElements(1L to rs.length))
      // ranks follow (score desc, term asc)
      val sorted = rs.sortBy(_._6)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._2 < b._2))
        case _ => ()
      }
    }
    // df is global: the same term must carry the same df everywhere
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._4).distinct.length == 1)
    }
  }

  test("text_bm25 catalog entry is a descending top-20 with bounded term matches") {
    val rows = run("text_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    rows.foreach { case (_, matched, score) =>
      assert(matched >= 1 && matched <= 4)
      assert(score > 0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
      case _ => ()
    }
  }

  test("bm25 ranking laws on a planted corpus") {
    import spark.implicits._
    // doc 1: query term repeated; doc 2: one hit in same length; doc 3: no
    // hits; doc 4: one hit in a much longer doc (length normalization)
    val docs = Seq(
      (1L, "vector vector vector sort sort"),
      (2L, "vector sort sort sort sort"),
      (3L, "sort join scan merge table"),
      (4L, "vector " + Seq.fill(40)("sort").mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("vector"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!out.contains(3L), "doc without query terms must not appear")
    assert(out(1L) > out(2L), "higher tf must outrank at equal length")
    assert(out(2L) > out(4L), "shorter doc must outrank at equal tf")
  }

  test("split_leakage_safe: no near-dup cluster straddles two splits; totals conserved") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // INDEPENDENT cluster labels (the operator must agree with these —
    // asserting on the operator's own cluster_id column alone would make
    // the no-straddle check tautological, since its split is a function
    // of whatever it labeled)
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", k = 5,
      threshold = 0.35, maxDocFreq = 100).select(col("id_a"), col("id_b"))
    val refLab = Dedup.clusterNearDups(d.select(col("doc_id").as("id")), pairs)
      .withColumnRenamed("cluster_id", "ref_cluster")
    val perDoc = Dedup.leakageSafeSplit(d, "doc_id", "text")
    // per REFERENCE cluster, every member's operator-assigned split agrees
    val straddlers = perDoc.join(refLab, "id")
      .groupBy("ref_cluster")
      .agg(countDistinct("split").as("ns")).where(col("ns") > 1).count()
    assert(straddlers == 0L)
    val got = run("split_leakage_safe").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.values.map(_._1).sum == d.count(), "every doc lands in a split")
    assert(got.values.map(_._2).sum ==
      refLab.select("ref_cluster").distinct().count(),
      "every cluster counted once")
  }

  test("mix_budget_select: every domain within budget; selection is a hash-order prefix") {
    import org.apache.spark.sql.functions._
    val rows = run("mix_budget_select").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= 1000L,
      s"domain ${r.getString(0)} over budget: ${r.getLong(2)}"))
    // prefix law: recompute the per-doc hash order and check the selected
    // count per domain equals the longest prefix whose token sum <= 1000
    // (the catalog query and its oracle pin budget = 1000)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val perDoc = d.select(col("doc_id"), col("source"),
        graft.functions.tokenCount(col("text")).as("tok"),
        graft.functions.hash60(concat(lit("mixsel#"),
          col("doc_id").cast("string"))).as("hk"))
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(0), r.getLong(2)))
    val expect = perDoc.groupBy(_._1).map { case (src, ds) =>
      val ordered = ds.sortBy(t => (t._2, t._3)).map(_._4)
      val prefix = ordered.scanLeft(0L)(_ + _).drop(1).takeWhile(_ <= 1000L)
      src -> (prefix.length.toLong, prefix.lastOption.getOrElse(0L))
    }.filter(_._2._1 > 0) // a domain whose first doc busts the budget emits no row
    val got = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect.toMap)
  }

  test("dataset_shuffle is a permutation with contiguous shard positions") {
    val rows = run("dataset_shuffle").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_._1).distinct.length == rows.length) // every doc once
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"shard $shard positions not contiguous 0..n-1")
    }
    // deterministic: recomputation reproduces the identical permutation
    val again = run("dataset_shuffle").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("text_classifier equals a driver-side recomputation of the model") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val w = graft.TextQueries.classifierWeightsU6
    assert(w.size == 256 && w.forall(v => v >= -1000000L && v <= 1000000L))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    val got = run("text_classifier").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == docs.size)
    got.foreach { case (id, (n, score, keep)) =>
      val toks = "[a-z]+".r
        .findAllIn(docs(id).toLowerCase(java.util.Locale.ROOT)).toSeq
      val s = toks.map(t => w((h60(s"clf#$t") % 256).toInt)).sum
      val expect = if (toks.isEmpty) 0L
        else math.floor(s.toDouble / toks.length.toDouble).toLong
      assert(n == toks.length && score == expect && keep == (expect >= 0L),
        s"doc $id: got ($n,$score,$keep), expected (${toks.length},$expect)")
    }
  }
}
