package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step every
  * near-dup pipeline ends with: candidate PAIRS (from MinHash-LSH, SimHash,
  * Jaccard) must be grouped into duplicate CLUSTERS so one canonical
  * document survives per cluster.
  *
  * Algorithm: iterative min-label propagation. Conceptually every vertex
  * starts labeled with itself; each round every vertex takes the min of
  * its own and its neighbors' labels; fixpoint when no label changes.
  * (In the code the first round is FUSED into initialization: from
  * identity labels it reduces to one neighbor-min aggregate.) Converges
  * in O(diameter) rounds — near-dup graphs are unions of small dense
  * cliques, so 2-3 rounds in practice.
  *
  * Scale: each round is one join (edges x labels, shuffled on vertex id)
  * plus one min-aggregate — all distributed; the only driver-side work is
  * the empty-diff convergence check. Labels are persisted per round and the
  * previous round unpersisted, so lineage stays bounded.
  *
  * Round shape (measured at sf0.1, this host, min-of-3): plain propagate
  * rounds with ONE localCheckpoint each are the fastest of four variants —
  * 3.6 s for the full q_dedup_components pipeline, vs 4.8 s for round 2's
  * propagate+jump with two checkpoints, 5.8 s for jump-with-recomputed-
  * propagate (exchange reuse does not recover the double subtree), and
  * 6.5 s for jump-over-persist. At this scale per-round JOB COUNT
  * dominates, so the cheapest round wins as long as the round count stays
  * small — which it does on near-dup graphs (unions of small cliques,
  * diameter 2-3). Pointer jumping (path halving, O(log diameter) rounds)
  * still guards the pathological long-chain case: it switches on
  * adaptively from round [[JumpFromRound]] when convergence evidently
  * isn't diameter-bounded-small.
  */
object ConnectedComponents {

  /** Propagate-only rounds before this one; pointer jumping joins in from
    * here on. 4 = shallow graphs (the common case) never pay the jump's
    * extra materialization, chains get O(log d) once it engages. */
  val JumpFromRound = 4

  /** Diagnostic only: round count of the most recent [[components]] call
    * on this driver (read by the scale probe to report how convergence
    * depth grows with data size). Not part of any query's semantics. */
  @volatile var lastRounds: Int = 0

  /** (id, component_id) for every vertex appearing in `pairs`, where
    * component_id = min vertex id of the component. Deterministic.
    *
    * The returned frame's storage (a localCheckpoint on every path,
    * including the empty input's fused-init frame) is registered with
    * [[CacheScope]]:
    * callers release it with `CacheScope.releaseAll()` once their action
    * completes — `catalog.clearCache()` cannot free LogicalRDD storage,
    * which is exactly how round 2 stranded one label RDD per call. */
  def components(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // persist the input FIRST: the symmetrizing union reads the pairs
    // subtree twice with different projections, so without a cache an
    // expensive candidate generator (the whole MinHash pipeline) would
    // compute twice — measured 15.5s -> ~6s at sf0.1
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b")).persist()
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist()
    edges.count() // materialize both caches, then drop the inner one
    p.unpersist(blocking = false)
    // Initial labels = round 1's propagate, fused into initialization:
    // with identity labels the first neighbor-min round reduces to ONE
    // aggregate over the symmetrized edges (every vertex appears as dst,
    // so no distinct-vertices pass is needed either) — each components()
    // call saves a full checkpoint + convergence cycle.
    // LAZY localCheckpoint throughout (round-19 A/B): the convergence
    // check right below is a FULL (non-short-circuiting) aggregate, so it
    // materializes every partition — writing the checkpoint as a side
    // effect of that same job instead of paying a separate eager
    // materialization job per round (2 jobs/round -> 1; the round-2
    // uncached-partition trap this file documents needed the FULL
    // aggregate, which stays).
    var labels = edges
      .select(col("dst").as("id"), least(col("src"), col("dst")).as("label"))
      .groupBy("id").agg(min("label").as("label"))
      .localCheckpoint(false)
    // Convergence check: labels are elementwise NON-INCREASING, so the
    // label sum is strictly decreasing until the fixpoint — one tiny
    // aggregate per round instead of an old-vs-new join. The aggregate also
    // materializes the round's cache COMPLETELY before the previous round
    // is unpersisted; a short-circuiting check (isEmpty) left partitions
    // uncached, and recomputing them after the ancestor cache was dropped
    // replayed the whole lineage — measured cost GROWING 1.2s -> 13s per
    // round. Decimal sum so the invariant holds even at 1e9+ vertices.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    // no pairs -> no vertices: sum() over zero rows is null; return the
    // empty labeling instead of entering the loop (null.compareTo NPE)
    var converged = prevSum == null
    // the fused initialization above IS effective propagate round 1 —
    // count from there so JumpFromRound keeps its pre-fusion meaning
    var round = 1
    while (!converged) {
      round += 1
      // Each propagate round: one join + min-agg, ONE eager localCheckpoint
      // (truncating the plan so driver-side re-analysis stays bounded —
      // without truncation it grew 1.2s -> 5.2s per round by round 4; on a
      // fault-tolerant cluster substitute reliable checkpoint()s).
      // (No union formulation: a Union whose branches share attribute ids
      // with a join inside one of them trips Catalyst's constraint rewrite
      // — "key not found" — once the result is self-joined.)
      val nbrMin = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
        .groupBy("id").agg(min("label").as("nl"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
                least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(false)
      // pointer jumping (path halving) from JumpFromRound on: follow each
      // label to ITS label in the same round, contracting label chains by
      // half — only worth its extra materialization when the graph is
      // evidently not a shallow clique union. Labels stay vertex ids,
      // monotonically non-increasing, bounded below by the component min,
      // so the fixpoint is unchanged (union-find property spec covers a
      // long chain that drives this path).
      val next =
        if (round < JumpFromRound) propagated
        else propagated.as("x")
          .join(propagated.as("y"), col("x.label") === col("y.id"))
          .select(col("x.id").as("id"), col("y.label").as("label"))
          .localCheckpoint(false)
      // full (non-short-circuiting) aggregate: materializes EVERY partition
      // of next's cache before the previous round is released below
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      CacheScope.release(labels)
      if (!(next eq propagated)) CacheScope.release(propagated)
      labels = next
    }
    edges.unpersist(blocking = false)
    lastRounds = round
    // the final round's storage outlives this call (the caller still has
    // to run its action) — hand its lifecycle to CacheScope
    CacheScope.track(labels)
    labels.select(col("id"), col("label").as("component_id"))
  }
}
