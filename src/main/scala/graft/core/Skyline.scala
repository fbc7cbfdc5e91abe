package graft.core

import scala.collection.mutable.ArrayBuffer

/** A d-dimensional data point in a QoS stream.
  *
  * Mirrors the reference's record model (`java/org.main/ServiceTuple.java:15-45`):
  * a monotonically-increasing id (doubles as the barrier-sync counter), the
  * d-dimensional attribute vector, and an `originPartition` tag stamped during the
  * local phase and consumed by the global phase for the Optimality metric.
  */
final case class Point(id: Long, values: Array[Double], originPartition: Int = -1)

/** Pareto-dominance kernel (minimization semantics).
  *
  * Semantics per reference `java/org.main/ServiceTuple.java:67-77`:
  * `a` dominates `b` iff a(i) <= b(i) for ALL i and a(i) < b(i) for AT LEAST one i.
  * Consequence: exact duplicates never dominate each other, so every duplicate of a
  * skyline point is itself a skyline member (observed in reference PDF §5.1).
  */
object Dominance {
  def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    val n = a.length
    if (n != b.length) return false
    var better = false
    var i = 0
    while (i < n) {
      val av = a(i); val bv = b(i)
      if (av > bv) return false
      if (av < bv) better = true
      i += 1
    }
    better
  }
}

/** Block-Nested-Loop skyline maintenance.
  *
  * Same fixpoint as the reference's buffered BNL
  * (`java/org.main/FlinkSkyline.java:417-444`): a candidate dominated by any
  * current member is dropped; a candidate that dominates members evicts them;
  * otherwise it is inserted. Insert order does not change the final set (BNL is
  * confluent), which is what makes the two-phase (partial/merge) decomposition
  * correct — skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)).
  *
  * Scale notes (this kernel runs per Spark partition / per agg buffer):
  *  - eviction uses swap-remove, so insert is O(s) with no shifting;
  *  - `sortedBySum` pre-ordering makes inserts eviction-free (a point can only be
  *    dominated by a point with a strictly smaller coordinate sum), roughly halving
  *    comparisons for bulk builds.
  */
final class SkylineBuffer extends Serializable {
  private[graft] var points = new ArrayBuffer[Point]()

  def size: Int = points.length
  def result: Seq[Point] = points.toSeq

  /** BNL insert: returns true if the candidate survived. */
  def insert(c: Point): Boolean = {
    var i = 0
    while (i < points.length) {
      val e = points(i)
      if (Dominance.dominates(e.values, c.values)) return false
      if (Dominance.dominates(c.values, e.values)) {
        // swap-remove: order of the buffer is irrelevant to the fixpoint
        points(i) = points(points.length - 1)
        points.remove(points.length - 1)
        // do not advance i: the swapped-in element must be checked too
      } else {
        i += 1
      }
    }
    points += c
    true
  }

  /** Insert knowing `c` cannot dominate any current member (ascending-sum order). */
  private def insertNoEvict(c: Point): Boolean = {
    var i = 0
    while (i < points.length) {
      if (Dominance.dominates(points(i).values, c.values)) return false
      i += 1
    }
    points += c
    true
  }

  def merge(other: SkylineBuffer): SkylineBuffer = {
    other.points.foreach(insert)
    this
  }
}

object SkylineBuffer {
  def empty: SkylineBuffer = new SkylineBuffer

  /** Skyline of an iterator, BNL with ascending-coordinate-sum presort.
    * A dominator always has a strictly smaller sum (all dims <=, one <), so after
    * sorting no insert can evict — each point is only checked against survivors.
    */
  def of(it: Iterator[Point]): SkylineBuffer = {
    val arr = it.toArray
    java.util.Arrays.sort(arr, (a: Point, b: Point) =>
      java.lang.Double.compare(a.values.sum, b.values.sum))
    val buf = new SkylineBuffer
    arr.foreach(buf.insertNoEvict)
    buf
  }

  /** Streaming-friendly incremental build (no presort), reference-BNL order. */
  def ofIncremental(it: Iterator[Point]): SkylineBuffer = {
    val buf = new SkylineBuffer
    it.foreach(buf.insert)
    buf
  }
}
