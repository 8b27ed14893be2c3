package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, SimilarityIVF}

/** Janino compile-share probe for the IVF centroid path (round-4 verdict
  * item 1): quantifies what the literal-matrix form of cell assignment
  * cost per Lloyd's round vs the constant-reference
  * [[graft.functions.expressions.CentroidDots]] form that replaced it.
  *
  * Mechanism under test: whole-stage codegen caches compiled units by the
  * GENERATED SOURCE. A centroid matrix embedded as K x Dim `lit(...)`
  * nodes changes the source every time the matrix values change, so every
  * training round (and every retrain) paid a fresh compilation of a
  * 1,024-literal method; a matrix passed via `ctx.addReferenceObj` leaves
  * the source byte-identical across rounds — one compilation ever.
  *
  * The probe emulates [[graft.operators.KMeans.train]]'s per-round plan
  * (assignment scan + (cell,dim) aggregate) for `Rounds` rounds with a
  * freshly perturbed matrix each round — exactly the situation training
  * creates — and reads Spark's codegen metrics
  * (`CodegenMetrics.METRIC_COMPILATION_TIME`) around each form.
  *
  * Usage: `runMain graft.CodegenProbe` (SPARK_GRAFT_SF_DIR selects the
  * fixture, default sf0.1). One JSON line per form:
  * compilations, compile ms, wall s.
  */
object CodegenProbe {

  val Rounds = 4

  /** The REMOVED literal form, kept here verbatim as the measurement
    * baseline: cell id via K dot products against `array(lit...)`
    * centroid literals (what SimilarityIVF.scoredCells was before
    * CentroidDots). */
  private def literalCell(vec: Column, cents: Array[Array[Double]]): Column =
    -array_max(array(cents.indices.map { c =>
      struct(Similarity.dot(vec, array(cents(c).map(lit(_)): _*)).as("dot"),
             lit(-c).as("negc"))
    }: _*)).getField("negc")

  private def referenceCell(vec: Column, cents: Array[Array[Double]]): Column =
    SimilarityIVF.cell(vec, cents)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // shared warmup so neither form absorbs first-query session costs
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    graft.sources.Tables.embeddings(spark, sfDir).count()

    import org.apache.spark.metrics.source.CodegenMetrics
    def snap(): (Long, Long) = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      // reservoir values are exact while the count stays under the
      // default 1028-sample reservoir — true for this probe's deltas
      (h.getCount, h.getSnapshot.getValues.sum)
    }

    def measure(label: String,
                cellFn: (Column, Array[Array[Double]]) => Column): Unit = {
      val e = graft.sources.Tables.embeddings(spark, sfDir)
      val (c0, ms0) = snap()
      val t0 = System.nanoTime()
      var cents = SimilarityIVF.hashCentroids
      (0 until Rounds).foreach { r =>
        // per-round aggregate of the assignment scan — KMeans.train's plan
        // shape — with matrix values UNIQUE to the round, as Lloyd's
        // updates make them
        val (rc0, rms0) = snap()
        e.select(cellFn(col("embedding"), cents).as("cell"),
                 posexplode(col("embedding")).as(Seq("dd", "x")))
          .groupBy("cell", "dd").agg(sum(col("x")).as("s"))
          .write.mode("overwrite").format("noop").save()
        val (rc1, rms1) = snap()
        val sz = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_GENERATED_CLASS_BYTECODE_SIZE.getSnapshot.getValues
        System.err.println(s"[codegen-probe] $label round $r: " +
          s"+${rc1 - rc0} compilations, +${rms1 - rms0} ms, " +
          s"last class sizes ${sz.takeRight(math.min(3, sz.length)).mkString(",")}")
        cents = cents.map(_.map(v => v * (1.0 + 1e-9 * (r + 1))))
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val (c1, ms1) = snap()
      println(s"""{"probe":"codegen","form":"$label","rounds":$Rounds,"compilations":${c1 - c0},"compile_ms":${ms1 - ms0},"wall_s":$wall}""")
    }

    // literal first, then reference: if anything, ordering hands the
    // reference form LESS cache benefit (the literal rounds already
    // warmed every shared operator)
    measure("literal_matrix", literalCell)
    measure("reference_matrix", referenceCell)
    spark.stop()
  }
}
