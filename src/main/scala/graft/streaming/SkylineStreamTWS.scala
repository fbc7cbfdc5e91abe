package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming._

import graft.core.{Point, SkylineBuffer}
import graft.streaming.SkylineStream.{Envelope, LocalResult, QueryResult}

/** The reference's full two-hop streaming topology as ONE Structured
  * Streaming query, via Spark 4 `transformWithState` (RocksDB state store):
  *
  *   envelopes ─ groupByKey(pid) ─ [LocalProcessor: BNL skyline + barrier
  *   state machine, A1+A2] ─ groupByKey(queryPayload) ─ [GlobalProcessor:
  *   incremental BNL merge + countdown latch, A3] ─ QueryResult
  *
  * This is the chained keyed-stage shape of the reference
  * (`java/org.main/FlinkSkyline.java:138-183`) that the older
  * `flatMapGroupsWithState` API could not express in a single query (it
  * cannot be chained); `transformWithState` can, so the global merge runs
  * as a distributed stateful operator instead of a driver-side accumulator.
  */
object SkylineStreamTWS {

  /** Per-query global-phase bookkeeping (the reference's ValueState/MapState
    * set, `FlinkSkyline.java:472-512`). `localSizes` is an assoc list — the
    * Avro state encoder supports arrays of structs but not MapType. */
  case class GlobalMeta(arrived: Int, minStart: Long, lastArrival: Long,
                        maxCpu: Long, dispatchMs: Long,
                        localSizes: Seq[(Int, Int)])

  /** Scalar half of the local state — everything EXCEPT the antichain,
    * which lives in a [[ListState]] so per-batch appends never rewrite it.
    * `nUncompacted` counts points appended since the last BNL compaction. */
  case class LocalScalars(maxSeenId: Long, pending: Seq[(String, Long)],
                          startMs: Long, cpuNanos: Long, nUncompacted: Int)

  /** A1+A2: local BNL skyline + barrier/trigger state machine, keyed by
    * spatial partition id. Same state transitions as
    * [[SkylineStream.stepLocal]] (the flatMapGroupsWithState shell), but
    * with the antichain SPLIT OUT of the scalar value state into a
    * RocksDB ListState and maintained lazily:
    *
    *  - a data-only micro-batch APPENDS its points to the list (O(batch)
    *    writes) instead of restoring + re-inserting + rewriting the whole
    *    antichain (O(antichain) per batch — the r5 verdict's 4-D
    *    anti-correlated growth concern, SURVEY §7.4);
    *  - the full-list BNL compaction runs only when a trigger fires (the
    *    emitted skyline must be exact) or when `compactLimit` raw points
    *    have piled up — so state size is bounded by |antichain| +
    *    compactLimit, and the O(list) rewrite is amortized over
    *    compactLimit appends. Deferral is semantics-preserving because BNL
    *    is confluent: insert order never changes the fixpoint. */
  class LocalProcessor(compactLimit: Int = 5000)
      extends StatefulProcessor[Int, Envelope, LocalResult] {
    @transient private var sky: ListState[Point] = _
    @transient private var sc: ValueState[LocalScalars] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // fresh handle names ("local" held the old monolithic LocalState):
      // a pre-split checkpoint restarts with fresh state instead of
      // crashing on a state-schema mismatch. CAVEAT — "fresh" means the
      // old antichain/barrier state is silently DISCARDED, which for an
      // exact-skyline query is a wrong answer, not a recovery: do not
      // resume a pre-split checkpoint with this code; start a new
      // checkpoint and replay the source instead (the repo carries no
      // persistent checkpoints, so nothing in-tree can hit this)
      sky = getHandle.getListState[Point]("local_sky",
        Encoders.product[Point], TTLConfig.NONE)
      sc = getHandle.getValueState[LocalScalars]("local_scalars",
        Encoders.product[LocalScalars], TTLConfig.NONE)
    }

    override def handleInputRows(pid: Int, rows: Iterator[Envelope],
                                 tv: TimerValues): Iterator[LocalResult] = {
      val t0 = System.nanoTime()
      val st = if (sc.exists()) sc.get() else LocalScalars(-1L, Nil, 0L, 0L, 0)
      var maxId = st.maxSeenId
      var startMs = st.startMs
      // data before triggers within the batch (deterministic barrier
      // semantics, like stepLocal)
      val (data, triggers) = rows.toSeq.partition(_.kind == 0)
      if (data.nonEmpty) {
        if (startMs == 0L) startMs = System.currentTimeMillis()
        val pts = new Array[Point](data.length)
        var i = 0
        data.foreach { e =>
          if (e.id > maxId) maxId = e.id
          pts(i) = Point(e.id, e.values); i += 1
        }
        sky.appendList(pts)
      }
      // parked queries re-check only when new data moved the barrier
      val (ready, parked) =
        if (data.nonEmpty)
          st.pending.partition { case (pl, _) =>
            maxId >= SkylineStream.requiredCount(pl) }
        else (Nil, st.pending)
      // new triggers: fire if barrier satisfied or partition empty
      // (maxId == -1, reference parity — see stepLocal)
      val (fireNow, parkNew) = triggers.partition(e =>
        maxId >= SkylineStream.requiredCount(e.payload) || maxId == -1L)
      val pending = parked ++ parkNew.map(e => (e.payload, e.dispatchMs))
      val nUnc = st.nUncompacted + data.length
      val mustFire = ready.nonEmpty || fireNow.nonEmpty
      var compacted: Seq[Point] = Nil
      var nUncOut = nUnc
      if (mustFire || nUnc >= compactLimit) {
        compacted = SkylineBuffer.of(sky.get()).result
        // ListState.put rejects empty arrays (Spark 4 contract)
        if (compacted.nonEmpty) sky.put(compacted.toArray) else sky.clear()
        nUncOut = 0
      }
      val cpu = st.cpuNanos + (System.nanoTime() - t0)
      sc.update(LocalScalars(maxId, pending, startMs, cpu, nUncOut))
      if (!mustFire) Iterator.empty
      else {
        val pts = compacted.map(_.copy(originPartition = pid))
        val start = if (startMs == 0L) System.currentTimeMillis() else startMs
        val cpuMs = cpu / 1000000L
        (ready.iterator.map { case (pl, dm) =>
          LocalResult(pid, pl, dm, start, pts, cpuMs) } ++
          fireNow.iterator.map(e =>
            LocalResult(pid, e.payload, e.dispatchMs, start, pts, cpuMs)))
      }
    }
  }

  /** A3: global skyline merge + countdown latch, keyed by query payload.
    * Emits exactly when all `totalPartitions` local results arrived, then
    * clears the per-query state (`FlinkSkyline.java:573,653-657`). */
  class GlobalProcessor(totalPartitions: Int)
      extends StatefulProcessor[String, LocalResult, QueryResult] {
    @transient private var buf: ListState[Point] = _
    @transient private var meta: ValueState[GlobalMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Point]("buf",
        Encoders.product[Point], TTLConfig.NONE)
      meta = getHandle.getValueState[GlobalMeta]("meta",
        Encoders.product[GlobalMeta], TTLConfig.NONE)
    }

    override def handleInputRows(payload: String, rows: Iterator[LocalResult],
                                 tv: TimerValues): Iterator[QueryResult] = {
      var m = if (meta.exists()) meta.get()
        else GlobalMeta(0, Long.MaxValue, 0L, 0L, 0L, Nil)
      val sky = new SkylineBuffer
      buf.get().foreach(p => sky.points += p)  // restore merged antichain
      rows.foreach { r =>
        // distinct-pid latch: a duplicated trigger payload makes partitions
        // answer twice; counting raw arrivals would fill the latch early
        // (dropping slow partitions) and double-merge antichains
        if (!m.localSizes.exists(_._1 == r.pid)) {
          m = GlobalMeta(m.arrived + 1,
            math.min(m.minStart, r.startMs), System.currentTimeMillis(),
            math.max(m.maxCpu, r.cpuMs), r.dispatchMs,
            m.localSizes :+ (r.pid -> r.skyline.size))
          r.skyline.foreach(sky.insert)
        }
      }
      if (m.arrived >= totalPartitions) {
        val finish = System.currentTimeMillis()
        val global = sky.result
        val survivors = global.groupBy(_.originPartition).view.mapValues(_.size)
        val sizesByPid = m.localSizes.toMap
        val sumRatios = (0 until totalPartitions).map { i =>
          sizesByPid.get(i) match {
            case Some(sz) if sz > 0 => survivors.getOrElse(i, 0).toDouble / sz
            case _ => 0.0
          }
        }.sum
        val parts = payload.split(",")
        val mapWall = math.max(0L, m.lastArrival - m.minStart)
        buf.clear(); meta.clear()
        Iterator.single(QueryResult(parts(0),
          if (parts.length > 1) parts(1).trim else "unknown",
          global.size, sumRatios / totalPartitions,
          math.max(0L, mapWall - m.maxCpu), m.maxCpu,
          finish - m.lastArrival, finish - m.minStart))
      } else {
        // ListState.put rejects empty arrays (Spark 4 contract): a latch
        // fed only empty-partition answers so far has nothing to store
        val merged = sky.result
        if (merged.nonEmpty) buf.put(merged.toArray) else buf.clear()
        meta.update(m)
        Iterator.empty
      }
    }
  }

  /** Like [[GlobalProcessor]] but emits the merged global skyline POINTS at
    * latch-fill (for oracle-checking the chained topology against the batch
    * skyline SQL; the reference's suppressed-payload emission path,
    * `FlinkSkyline.java:643-646`, behind its output flag). */
  /** Distinct partitions already counted toward a query's latch (duplicate
    * trigger payloads make partitions answer more than once). */
  case class ArrivedPids(pids: Seq[Int])

  class GlobalPointsProcessor(totalPartitions: Int)
      extends StatefulProcessor[String, LocalResult, Point] {
    @transient private var buf: ListState[Point] = _
    @transient private var arrived: ValueState[ArrivedPids] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Point]("buf",
        Encoders.product[Point], TTLConfig.NONE)
      // handle named 'arrived_pids', NOT 'arrived': the value encoding
      // changed from Int to ArrivedPids, and reusing the old handle name
      // would make a restart from a pre-change checkpoint fail on a
      // state-schema mismatch instead of starting this state fresh
      arrived = getHandle.getValueState[ArrivedPids]("arrived_pids",
        Encoders.product[ArrivedPids], TTLConfig.NONE)
    }

    override def handleInputRows(payload: String, rows: Iterator[LocalResult],
                                 tv: TimerValues): Iterator[Point] = {
      var pids = if (arrived.exists()) arrived.get().pids else Nil
      val sky = new SkylineBuffer
      buf.get().foreach(p => sky.points += p)
      rows.foreach { r =>
        // distinct-pid latch; see GlobalProcessor
        if (!pids.contains(r.pid)) {
          pids = pids :+ r.pid
          r.skyline.foreach(sky.insert)
        }
      }
      if (pids.size >= totalPartitions) {
        buf.clear(); arrived.clear()
        sky.result.iterator
      } else {
        // ListState.put rejects empty arrays (Spark 4 contract)
        val merged = sky.result
        if (merged.nonEmpty) buf.put(merged.toArray) else buf.clear()
        arrived.update(ArrivedPids(pids))
        Iterator.empty
      }
    }
  }

  /** [[topology]] variant emitting the global skyline points. */
  def topologyPoints(env: Dataset[Envelope], totalPartitions: Int,
                     compactLimit: Int = 5000): Dataset[Point] = {
    implicit val lrEnc: Encoder[LocalResult] = ExpressionEncoder[LocalResult]()
    implicit val ptEnc: Encoder[Point] = ExpressionEncoder[Point]()
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt
    implicit val strEnc: Encoder[String] = Encoders.STRING
    env.groupByKey(_.pid)
      .transformWithState(new LocalProcessor(compactLimit), TimeMode.None(),
        OutputMode.Append())
      .groupByKey(_.payload)
      .transformWithState(new GlobalPointsProcessor(totalPartitions),
        TimeMode.None(), OutputMode.Append())
  }

  /** The full chained topology. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def topology(env: Dataset[Envelope], totalPartitions: Int,
               compactLimit: Int = 5000): Dataset[QueryResult] = {
    implicit val lrEnc: Encoder[LocalResult] = ExpressionEncoder[LocalResult]()
    implicit val qrEnc: Encoder[QueryResult] = ExpressionEncoder[QueryResult]()
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt
    implicit val strEnc: Encoder[String] = Encoders.STRING
    env.groupByKey(_.pid)
      .transformWithState(new LocalProcessor(compactLimit), TimeMode.None(),
        OutputMode.Append())
      .groupByKey(_.payload)
      .transformWithState(new GlobalProcessor(totalPartitions),
        TimeMode.None(), OutputMode.Append())
  }
}
