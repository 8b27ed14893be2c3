package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The 3-bands x 4-rows banding variant (q_dedup_minhash_banded) against
  * the 6 x 2 default: same 12 signature minima, steeper per-band collision
  * curve (J^4 vs J^2).
  *
  * Containment is a THEOREM of the shared signature layout, not a
  * statistical property: a 4-row band in the (3,4) split covers signature
  * rows 4j..4j+3, i.e. exactly two consecutive 2-row bands of the (6,2)
  * split — so any pair agreeing on a (3,4) band necessarily agrees on two
  * (6,2) bands and is a (6,2) candidate too. The spec pins that, plus the
  * recall floor that matters: exact duplicates (all 12 minima equal)
  * survive any banding of the same signature.
  */
class BandedMinHashSpec extends SparkSpec {

  test("4-row-band candidates are a subset of the default 2-row-band candidates") {
    val docs = Tables.documents(spark, sfDir)
    val r2 = MinHashLSH.candidatePairs(docs, "doc_id", "text", "lang")
    val r4 = MinHashLSH.candidatePairs(docs, "doc_id", "text", "lang",
      numBands = 3, rowsPerBand = 4)

    val extra = r4.join(r2, Seq("id_a", "id_b"), "left_anti").count()
    assert(extra == 0, "a (3,4)-band candidate pair was not a (6,2) candidate")

    val (n2, n4) = (r2.count(), r4.count())
    assert(n4 > 0, "banded variant found no candidates on the fixture")
    assert(n4 <= n2)
  }

  test("exact duplicates remain candidates under 4-row banding") {
    // identical texts share every shingle, hence all 12 minima, hence
    // every band under any split of the same signature
    // deterministic slice (limit() may pick different rows per action) of
    // docs long enough to have shingles at all
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50 && size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), col("text"), col("lang"))
    val dupes = docs.select(col("doc_id") + 1000000L, col("text"), col("lang"))
      .toDF("doc_id", "text", "lang")
    val corpus = docs.unionByName(dupes)

    val r4 = MinHashLSH.candidatePairs(corpus, "doc_id", "text", "lang",
      numBands = 3, rowsPerBand = 4)
    val missed = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000L).as("id_b"))
      .join(r4, Seq("id_a", "id_b"), "left_anti")
      .count()
    assert(missed == 0, s"$missed exact-duplicate pairs missed by (3,4) banding")
  }
}
