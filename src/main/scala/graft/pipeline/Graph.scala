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
  * Cost discipline for the iterative phase (measured at sf0.1, where the
  * dup graph has ~10³ edges: these took the first cut from ~6 s of loop
  * overhead to well under a second):
  *  - the input subtree (an expensive LSH pipeline) is evaluated ONCE:
  *    both edge orientations come from one `explode`, never from a
  *    self-union that duplicates the upstream plan;
  *  - the edge list is repartitioned proportionally to its measured size
  *    (~1M edges/partition) before the loop — 32-way shuffles of a
  *    thousand-edge graph are pure scheduling overhead, one partition of
  *    a 10¹⁰-edge graph doesn't fit;
  *  - the convergence check rides inside the per-round checkpoint (each
  *    round's frame carries the previous label), so a round costs exactly
  *    two jobs: materialize, and a cached-scan count — no compare-join.
  *
  * The per-round `count` is driver-side loop control, not data
  * collection — the same iterate-until-fixpoint driver every Pregel-style
  * system runs.
  */
object Graph {

  /** Below this many (oriented) edges the graph is collected and solved
    * with driver-side union-find instead of the iterative join loop: a
    * thousand-edge graph costs ~2 s of pure per-round scheduling in the
    * distributed path (3 rounds × joins + checkpoint + count) versus
    * ~milliseconds of union-find. The collect at the 1M-edge cutover is
    * ~16 MB of primitive payload but on the order of 100 MB transient on
    * the driver once Row/tuple/HashMap boxing is counted — sized for the
    * multi-GB drivers a 100 TB job runs with, the same family of
    * small-side hybrid as broadcast-join selection.
    * The cutover is on the MEASURED count (already materialized for the
    * partition sizing), not an estimate, and both paths produce the
    * identical min-label fixpoint (equality is tested).
    */
  private val SmallGraphEdges = 1L << 20

  /** Connected components over an undirected edge list. `edges` must have
    * two long columns (src, dst by any name); both orientations are
    * derived internally. Returns one row per vertex that appears in any
    * edge: (vertex, component) with component = min vertex id reachable.
    * `smallGraphMax` overrides the driver-side fast-path threshold
    * (tests pass 0 to force the distributed loop).
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20,
      smallGraphMax: Long = SmallGraphEdges): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edge list needs exactly 2 columns, got ${cols.mkString(",")}")
    // one explode emits both orientations in a single pass over the input
    // plan (a union of two selects would evaluate the upstream twice);
    // no dedup needed — duplicate edges cannot change a min-aggregation
    val und0 = edges
      .select(explode(array(
        struct(col(cols(0)).as("src"), col(cols(1)).as("dst")),
        struct(col(cols(1)).as("src"), col(cols(0)).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    val nEdges = try und0.count() // also materializes the persist
    catch { case e: Throwable => und0.unpersist(); throw e }
    // strict <, so the documented smallGraphMax = 0 override forces the
    // distributed loop even for an empty graph (its empty-input behavior
    // stays test-reachable)
    if (nEdges < smallGraphMax) {
      try {
        val result = unionFind(und0.collect().map(r => (r.getLong(0), r.getLong(1))))
        val spark = edges.sparkSession
        import spark.implicits._
        return result.toSeq.toDF("vertex", "component")
      } finally und0.unpersist() // same no-leak invariant as the loop path
    }
    val parts = math.max(1, math.min(256, (nEdges / 1000000L).toInt + 1))
    val und = und0.coalesce(parts)

    // the loop's data-size proportionality comes from the coalesce above
    // plus AQE's runtime shuffle coalescing — deliberately NOT from
    // mutating the session's shuffle.partitions, which would clobber any
    // concurrent query sharing the SparkSession (measured: the conf
    // change bought nothing over coalesce+AQE anyway)
    try {
      // round 1's neighbor-min needs no join while every label is still its
      // vertex id — it is a plain agg over the edge list, fused into init
      var labels = und
        .groupBy(col("src"))
        .agg(min(col("dst")).as("m"))
        .select(col("src").as("v"), least(col("src"), col("m")).as("lbl"))
        .localCheckpoint(eager = true)
      var changed = 1L
      var it = 0
      while (changed > 0 && it < maxIters) {
        val nbrMin = und
          .join(labels.select(col("v").as("dst"), col("lbl")), Seq("dst"))
          .groupBy(col("src").as("v")).agg(min(col("lbl")).as("nlbl"))
        val step = labels
          .join(nbrMin, Seq("v"), "left_outer")
          .select(col("v"), col("lbl").as("prev"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        val jumped = step.as("x")
          .join(step.select(col("v").as("p"), col("lbl").as("plbl")).as("y"),
            col("x.lbl") === col("y.p"), "left_outer")
          .select(col("x.v").as("v"), col("x.prev").as("prev"),
            least(col("x.lbl"), coalesce(col("plbl"), col("x.lbl"))).as("lbl"))
          // cut lineage per round — otherwise iters nest join plans exponentially
          .localCheckpoint(eager = true)
        changed = jumped.filter(col("lbl") =!= col("prev")).count()
        labels = jumped.select(col("v"), col("lbl"))
        it += 1
      }
      labels.select(col("v").as("vertex"), col("lbl").as("component"))
    } finally {
      // unpersist on every exit path — a mid-loop failure must not leak
      // the cached edge list in a long-lived session
      und0.unpersist()
    }
  }

  /** Driver-side union-find with path compression and a min-root-wins
    * merge, so every vertex resolves to its component's minimum id — the
    * same fixpoint the distributed loop computes. Input may contain both
    * orientations and duplicates.
    */
  private[graft] def unionFind(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (s, d) =>
      parent.getOrElseUpdate(s, s)
      parent.getOrElseUpdate(d, d)
      val rs = find(s); val rd = find(d)
      if (rs != rd) parent(math.max(rs, rd)) = math.min(rs, rd)
    }
    // snapshot the keys BEFORE resolving: find()'s path compression writes
    // into the map, and mutating a mutable.HashMap while lazily draining
    // keysIterator silently drops entries (caught by the 3000-case
    // union-find fuzz: 2 of 11 vertices vanished from the output)
    parent.keys.toArray.map(v => (v, find(v)))
  }
}
