package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the cluster-resolution step a dedup
  * pipeline needs after pair generation: near-dup PAIRS (doc_a, doc_b)
  * become per-document cluster labels, so "keep one doc per near-dup
  * cluster" is a filter, not a graph walk at read time.
  *
  * Algorithm: min-label propagation with pointer jumping. Each iteration
  * runs (a) a neighbor-min step — every vertex takes the min label among
  * itself and its neighbors (one equi-join + hash-agg on the edge list) —
  * and (b) a label-compression step `lbl := lbl(lbl)` (self-join on the
  * label table). (a) alone needs O(diameter) rounds on a chain; (b) halves
  * the pointer depth each round, so convergence is O(log diameter) — the
  * standard large-graph CC shape (Hash-to-Min family) expressed as plain
  * DataFrame joins, AQE-visible, no vertex ever holds more than one label.
  * The fixpoint is exact and iteration-order independent: every vertex
  * ends at its component's minimum id, which is what makes the result
  * oracle-checkable (a recursive-CTE transitive closure computes the same
  * minimum).
  *
  * The per-round convergence check is one `count` action on the changed
  * labels (driver-side loop control, not data collection) — the same
  * iterate-until-fixpoint driver every Pregel-style system runs.
  */
object Graph {

  /** Connected components over an undirected edge list. `edges` must have
    * two long columns (src, dst by any name); both orientations are
    * derived internally. Returns one row per vertex that appears in any
    * edge: (vertex, component) with component = min vertex id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edge list needs exactly 2 columns, got ${cols.mkString(",")}")
    val pairs = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    val und = pairs
      .union(pairs.select(col("dst"), col("src")))
      .distinct()
      .persist() // scanned once per round — at warehouse scale a temp table
    var labels = und.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
      .localCheckpoint(eager = true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = und
        .join(labels.select(col("v").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src").as("v")).agg(min(col("lbl")).as("nlbl"))
      val step = labels
        .join(nbrMin, Seq("v"), "left_outer")
        .select(col("v"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val jumped = step.as("x")
        .join(step.select(col("v").as("p"), col("lbl").as("plbl")).as("y"),
          col("x.lbl") === col("y.p"), "left_outer")
        .select(col("x.v").as("v"),
          least(col("x.lbl"), coalesce(col("plbl"), col("x.lbl"))).as("lbl"))
        // cut lineage per round — otherwise iters nest join plans exponentially
        .localCheckpoint(eager = true)
      changed = jumped.as("n")
        .join(labels.as("o"), col("n.v") === col("o.v"))
        .filter(col("n.lbl") =!= col("o.lbl")).count()
      labels = jumped
      it += 1
    }
    und.unpersist()
    labels.select(col("v").as("vertex"), col("lbl").as("component"))
  }
}
