package graft.grid

/** Overview-level selection (SURVEY §4, the reference's COG pyramid
  * read trick, ingestion/asset_writer.py:188-211): serve zoomed-out
  * reads from the coarsest level whose resolution still satisfies the
  * request. A plain function — the planner doesn't need a Catalyst rule
  * because level choice is a driver-side constant per request. */
object Overviews {

  /** Largest available downsample factor whose pixel size still meets
    * the requested ground resolution; 1 (full res) when none do. */
  def selectLevel(levels: Seq[Int], basePxDeg: Double, requestedPxDeg: Double): Int =
    levels.sorted.reverse.find(f => basePxDeg * f <= requestedPxDeg).getOrElse(1)
}
