package graft.operators

import graft.core.Point

/** Measurement-only bridge into the package-private kd merge primitives,
  * so `tools/` probes can time kd build and the dominance filter apart
  * from the Spark plumbing around them. Not part of the operator API. */
object KdProbeBridge {
  def build(points: Array[Point]): SkylineOps.KdIndex =
    SkylineOps.buildKd(points)
  def dominated(ix: SkylineOps.KdIndex, p: Point): Boolean =
    SkylineOps.dominatedByKd(ix, p)
}
