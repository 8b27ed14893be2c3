package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step every
  * near-dup pipeline ends with: candidate PAIRS (from MinHash-LSH, SimHash,
  * Jaccard) must be grouped into duplicate CLUSTERS so one canonical
  * document survives per cluster.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts labeled
  * with itself; each round every vertex takes the min of its own and its
  * neighbors' labels; fixpoint when no label changes. Converges in
  * O(diameter) rounds — near-dup graphs are unions of small dense cliques,
  * so 2-3 rounds in practice.
  *
  * Scale: each round is one join (edges x labels, shuffled on vertex id)
  * plus one min-aggregate — all distributed; the only driver-side work is
  * the empty-diff convergence check. Labels are persisted per round and the
  * previous round unpersisted, so lineage stays bounded. At extreme
  * diameters the large-star/small-star variant (alternating label
  * contraction) drops rounds to O(log n); the round body below is the same
  * join+min shape, so it is a drop-in evolution, not a redesign.
  */
object ConnectedComponents {

  /** Release a frame's materialized storage whether it came from persist()
    * (CacheManager) or localCheckpoint() (storage held by the underlying
    * RDD — Dataset.unpersist is a no-op for those, so the per-round label
    * sets would otherwise only be freed by GC). */
  private def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }

  /** (id, component_id) for every vertex appearing in `pairs`, where
    * component_id = min vertex id of the component. Deterministic. */
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
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
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
    while (!converged) {
      // localCheckpoint (eager) truncates the logical plan each round:
      // without it the plan nests one join+union+agg deeper per round and
      // driver-side re-analysis grows without bound — measured 1.2s ->
      // 5.2s per round by round 4. (On a cluster with fault-tolerance
      // requirements, substitute reliable checkpoint()s — same shape.)
      // neighbor-min joined back with the own label (no union: a Union
      // whose branches share attribute ids with the join inside one of
      // them trips Catalyst's constraint rewrite — "key not found" — once
      // the result is self-joined below). Checkpointed BEFORE the
      // self-join so each round's plan stays constant-depth.
      val nbrMin = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
        .groupBy("id").agg(min("label").as("nl"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
                least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
      // pointer jumping (path halving): follow each label to ITS label in
      // the same round — label chains contract by half per round, so
      // convergence is O(log diameter) instead of O(diameter). Labels are
      // always vertex ids, monotonically non-increasing, and bounded below
      // by the component minimum, so the fixpoint is unchanged (the
      // union-find property test guards this).
      val next = propagated.as("x")
        .join(propagated.as("y"), col("x.label") === col("y.id"))
        .select(col("x.id").as("id"), col("y.label").as("label"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      release(labels)
      release(propagated) // next is materialized; the intermediate can go
      labels = next
    }
    edges.unpersist(blocking = false)
    labels.select(col("id"), col("label").as("component_id"))
  }
}
