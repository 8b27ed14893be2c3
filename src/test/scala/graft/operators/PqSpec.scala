package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.PqExpressions
import graft.sources.Tables

/** Product-quantization kernels and the IVFADC pipeline: encode/LUT/ADC
  * agree with an independent Scala replay of the definitions, malformed
  * vectors surface as NULL, the candidate side of the probe join provably
  * drops the vector payload (the compression claim, pinned at plan
  * level), and the serving funnel's stages nest consistently. */
class PqSpec extends SparkSpec {

  private def independentCodes(v: Array[Float]): Array[Int] =
    Array.tabulate(Pq.M) { m =>
      val dists = Array.tabulate(Pq.C) { c =>
        var acc = 0.0
        (0 until Pq.SubDim).foreach { d =>
          val diff = v(m * Pq.SubDim + d).toDouble - Pq.codeWeight(m, c, d)
          acc += diff * diff
        }
        acc
      }
      dists.indexOf(dists.min) // first occurrence = lower-code tie-break
    }

  private def independentAdc(q: Array[Float], codes: Array[Int]): Double = {
    var acc = 0.0
    (0 until Pq.M).foreach { m =>
      var lut = 0.0
      (0 until Pq.SubDim).foreach { d =>
        lut += q(m * Pq.SubDim + d).toDouble * Pq.codeWeight(m, codes(m), d)
      }
      acc += lut
    }
    acc
  }

  test("pq_encode and pq_adc are bit-equal to an independent replay") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, sfDir).limit(20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val df = e.toSeq.toDF("vec_id", "embedding")
    val cb = Pq.codebook
    val got = df.select(col("vec_id"),
        PqExpressions.pq_encode(col("embedding"), cb).as("codes"),
        PqExpressions.pq_adc(
          PqExpressions.pq_lut(col("embedding"), cb),
          PqExpressions.pq_encode(col("embedding"), cb)).as("self_adc"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1).toArray, r.getDouble(2))).toMap
    e.foreach { case (id, vec) =>
      val codes = independentCodes(vec)
      assert(got(id)._1.toSeq == codes.toSeq, s"codes diverge for vec $id")
      // self-ADC = the PQ approximation of dot(v, v); exact same folds
      assert(got(id)._2 == independentAdc(vec, codes),
        s"ADC diverges for vec $id")
    }
  }

  private def cbEq(a: Array[Array[Array[Double]]], b: Array[Array[Array[Double]]]): Boolean =
    a.length == b.length && a.indices.forall(m =>
      a(m).length == b(m).length &&
        a(m).indices.forall(c => java.util.Arrays.equals(a(m)(c), b(m)(c))))

  test("codebook training: 0 rounds is the hash seed; rounds are an independent-replay Lloyd's step") {
    val s = spark
    import s.implicits._
    val vecs = Tables.embeddings(s, sfDir).limit(64)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val e = vecs.toSeq.map(Tuple1(_)).toDF("embedding")
    assert(cbEq(Pq.trainCodebook(e, maxIters = 0), Pq.codebook),
      "maxIters = 0 must return the hash-seeded codebook unchanged")
    // one round, replayed independently: assign every vector's subvectors
    // with PqEncode semantics against the SEED, then the fixed-point exact
    // mean per (m, code, d); empty codes keep their seed codeword
    val expect = Pq.codebook.map(_.map(_.clone))
    val sums = Array.fill(Pq.M, Pq.C, Pq.SubDim)(BigInt(0))
    val counts = Array.fill(Pq.M, Pq.C)(0L)
    vecs.foreach { v =>
      val codes = independentCodes(v)
      (0 until Pq.M).foreach { m =>
        counts(m)(codes(m)) += 1
        (0 until Pq.SubDim).foreach { d =>
          sums(m)(codes(m))(d) +=
            BigInt((v(m * Pq.SubDim + d).toDouble * KMeans.Scale).toLong)
        }
      }
    }
    (0 until Pq.M).foreach(m => (0 until Pq.C).foreach { c =>
      if (counts(m)(c) > 0) (0 until Pq.SubDim).foreach { d =>
        expect(m)(c)(d) =
          sums(m)(c)(d).toDouble / KMeans.Scale / counts(m)(c).toDouble
      }
    })
    assert(cbEq(Pq.trainCodebook(e, maxIters = 1), expect),
      "one training round diverges from the independent Lloyd's replay")
  }

  test("codes are M small ints — 64 bits of payload per vector") {
    val s = spark
    val e = Tables.embeddings(s, sfDir)
    val stats = e.select(PqExpressions.pq_encode(col("embedding"), Pq.codebook).as("codes"))
      .select(size(col("codes")).as("m"),
        array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .agg(min("m"), max("m"), min("lo"), max("hi"))
      .collect()(0)
    assert(stats.getInt(0) == Pq.M && stats.getInt(1) == Pq.M)
    assert(stats.getInt(2) >= 0 && stats.getInt(3) < Pq.C)
  }

  test("malformed vector length yields NULL, not a truncated encode") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array.fill(17)(0.5f))).toDF("vec_id", "embedding")
    val r = df.select(
      PqExpressions.pq_encode(col("embedding"), Pq.codebook).as("codes"),
      PqExpressions.pq_lut(col("embedding"), Pq.codebook).as("lut"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  // every exchange (shuffle OR broadcast) downstream of the scans: the
  // query side moves (query_id, lut, cell[, cdot]), the candidate side
  // moves (neighbor_id, cell, codes) or aggregate heap entries — the
  // 512-byte vector payload (and the residual derived from it) must be
  // consumed by the scan-stage projections and never cross an exchange
  private def assertNoVectorOnExchanges(df: org.apache.spark.sql.DataFrame): Unit = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    var exchangeOuts = Seq.empty[Seq[String]]
    def walk(p: SparkPlan): Unit = p.foreach {
      case q: QueryStageExec => walk(q.plan)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case ex: Exchange => exchangeOuts +:= ex.output.map(_.name)
        ex.children.foreach(walk)
      case _ => ()
    }
    walk(df.queryExecution.executedPlan)
    assert(exchangeOuts.nonEmpty, "expected at least one exchange in the plan")
    exchangeOuts.foreach { out =>
      assert(!out.exists(n => n.startsWith("embedding") ||
          n.startsWith("c_vec") || n.startsWith("q_vec") || n.startsWith("res")),
        s"vector payload crossed an exchange: $out")
    }
  }

  test("the candidate side of the IVFADC join carries codes, never vectors") {
    val s = spark
    val e = Tables.embeddings(s, sfDir)
    assertNoVectorOnExchanges(Pq.ivfAdcTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 5))
  }

  test("the residual-trained candidate side also carries codes, never vectors or residuals") {
    val s = spark
    val e = Tables.embeddings(s, sfDir)
    val cents = KMeans.trainForFixture(e, sfDir)
    val cb = Pq.trainResidualForFixture(e, sfDir)
    assertNoVectorOnExchanges(Pq.ivfAdcResidualTopK(
      e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10),
      k = 5, cb = cb, cents = cents))
  }

  test("rerank neighbors come from the ADC shortlist and carry exact ranks") {
    val s = spark
    val e = Tables.embeddings(s, sfDir)
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    val shortlist = Pq.ivfAdcTopK(q, c, k = 20).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rer = Pq.ivfAdcRerank(q, c, k = 5, r = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rer.nonEmpty)
    rer.foreach { case (qid, nid, rank) =>
      assert(shortlist.contains((qid, nid)),
        s"rerank emitted ($qid, $nid) outside the ADC shortlist")
      assert(rank >= 1 && rank <= 5)
    }
    // ranks are dense per query: 1..n with no gaps
    rer.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }
}
