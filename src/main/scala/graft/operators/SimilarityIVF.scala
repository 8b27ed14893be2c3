package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors — the second scale
  * path beside [[SimilarityLSH]]: partition the corpus into `K` coarse
  * cells by nearest centroid, probe only the `NProbe` cells nearest the
  * query, rank the probed candidates by exact cosine.
  *
  * Centroids here are deterministic hash-derived vectors (same md5 device
  * as the LSH hyperplanes), so cell assignment is reproducible inside
  * DuckDB SQL and the whole pipeline is exactly oracle-checkable. A
  * production deployment would swap in k-means centroids — every plan
  * shape below is centroid-agnostic; only the literals change.
  *
  * Scale design: cell assignment is a narrow, codegen'd scan (K dot
  * products per row against broadcast-literal centroids — no shuffle, no
  * training job in the query path); the probe join shuffles candidates by
  * cell id once; per-query scoring work is NProbe/K of the corpus instead
  * of all of it; ranking is the bounded-heap [[graft.functions.expressions.TopKByScore]]
  * (map-side k entries per query), not a window sort.
  */
object SimilarityIVF {

  val Dim = 64
  val K = 16       // coarse cells
  val NProbe = 2   // cells probed per query (the compiled default)

  /** The SERVED paths' probe width ([[IvfIndex.probe]],
    * [[PqIndex.probe]]/`probeRerank`) — the recall/cost dial a production
    * deployment turns without reindexing (probe cost is linear in it;
    * SCALE.md measures the trade at 1/2/4/8). `-Dgraft.ivf.nprobe`,
    * default [[NProbe]], validated into [1, K]. Like the `Buckets` knobs:
    * the declared queries and their DuckDB oracles are generated at the
    * DEFAULT — setting the property changes served rankings, so the
    * correctness gate must run with it unset. */
  def nProbeServed: Int = {
    val raw = sys.props.getOrElse("graft.ivf.nprobe", NProbe.toString)
    val n = raw.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"-Dgraft.ivf.nprobe must be an integer, got '$raw'"))
    require(n >= 1 && n <= K,
      s"-Dgraft.ivf.nprobe must be in [1, $K], got $n")
    n
  }

  /** Centroid `c`, dimension `d` weight in [-1, 1] — same portable
    * md5-derived device as [[SimilarityLSH.planeWeight]], different label
    * family ("ivf" prefix) so the two operators' geometries are
    * independent. */
  def centroidWeight(c: Int, d: Int): Double =
    graft.functions.PortableHash.labelWeight(s"ivf${c}_$d")

  /** The untrained (hash-derived) centroid matrix — the deterministic
    * default, and the seed [[KMeans.train]] starts Lloyd's from. */
  def hashCentroids: Array[Array[Double]] =
    Array.tabulate(K, Dim)(centroidWeight)

  /** array<struct<dot,negc>> of the vector's dot with every centroid;
    * struct max order = (dot DESC, cell ASC) since negc = -cell.
    * `cents` enters as a CONSTANT OBJECT through
    * [[graft.functions.expressions.CentroidDots]] (ctx.addReferenceObj),
    * NOT as K x Dim literals: the literal form regenerated different
    * Janino source per centroid update, so every Lloyd's round (and every
    * retrain) paid a fresh compilation of a 1,024-literal method — the
    * round-4 bench's dominant q_sim_ivf_kmeans fixed cost. With the
    * matrix as a reference object the generated source is round-invariant
    * and compiles once. The K dot products still run as one tight codegen
    * loop in the scan; only the 16-element struct/argmax tail is
    * interpreted HOF work. */
  private def scoredCells(vec: Column, cents: Array[Array[Double]]): Column =
    transform(
      graft.functions.expressions.VectorExpressions.centroid_dots(vec, cents),
      // aliases inside a lambda don't survive resolution — the cast names
      // the fields (value no-op: dot is already double, -i already int)
      (dot, i) => struct(dot, -i).cast("struct<dot:double,negc:int>"))

  /** Nearest-centroid cell id (deterministic tie-break toward the lower
    * cell id) — the list-build + max runs inside one codegen stage. */
  def cell(vec: Column, cents: Array[Array[Double]] = hashCentroids): Column =
    -array_max(scoredCells(vec, cents)).getField("negc")

  /** The `nprobe` nearest cell ids for a query vector. */
  def probeCells(vec: Column, cents: Array[Array[Double]] = hashCentroids,
                 nprobe: Int = NProbe): Column = {
    val sorted = reverse(array_sort(scoredCells(vec, cents)))
    array((0 until nprobe).map(i =>
      -element_at(sorted, i + 1).getField("negc")): _*)
  }

  /** The `NProbe` nearest cells WITH the query-centroid dot —
    * array<struct<cell:int, cdot:double>>. Residual-PQ ADC needs the dot:
    * dot(q, v) ~ dot(q, centroid[cell]) + dot(q, quantized residual), and
    * the first term falls out of the probe ranking already computed here. */
  def probeCellsWithDot(vec: Column, cents: Array[Array[Double]] = hashCentroids,
                        nprobe: Int = NProbe): Column = {
    val sorted = reverse(array_sort(scoredCells(vec, cents)))
    array((0 until nprobe).map { i =>
      val e = element_at(sorted, i + 1)
      struct((-e.getField("negc")).as("cell"), e.getField("dot").as("cdot"))
    }: _*)
  }

  /** IVF top-k: exact cosine rank over candidates in the query's NProbe
    * nearest cells. Output (query_id, neighbor_id, rank). */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              idColQ: String = "vec_id", idColC: String = "vec_id",
              vecCol: String = "embedding",
              cents: Array[Array[Double]] = hashCentroids): DataFrame = {
    val q = broadcast(queries
      .select(col(idColQ).as("query_id"), col(vecCol).as("q_vec"),
              explode(probeCells(col(vecCol), cents)).as("cell")))
    val c = candidates
      .select(col(idColC).as("neighbor_id"), col(vecCol).as("c_vec"),
              cell(col(vecCol), cents).as("cell"))
    rankProbed(q, c, k)
  }

  /** The probe/rank tail shared with the persisted-index path
    * ([[IvfIndex.probe]]): join exploded query probes
    * (query_id, q_vec, cell) against assigned candidates
    * (neighbor_id, c_vec, cell), exact-cosine rank per query. Cells are
    * disjoint per candidate (unlike LSH's multi-table buckets), so no
    * pair-dedup stage is needed before the bounded-heap rank. */
  def rankProbed(q: DataFrame, c: DataFrame, k: Int): DataFrame =
    c.join(q, Seq("cell"))
      .withColumn("score", Similarity.cosine(col("q_vec"), col("c_vec")))
      .groupBy(col("query_id"))
      .agg(graft.functions.expressions.TopKAggregate
        .top_k(col("score"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), col("entry.id").as("neighbor_id"),
              (col("pos") + 1).cast("long").as("rank"))
}
