package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 60-bit string hash: the first 15 hex digits of md5,
  * parsed as an integer. Both Spark (`conv`) and DuckDB (`'0x'||… cast`)
  * produce the identical value, which makes hash-derived operators
  * (MinHash, SimHash, LSH bucketing) exactly oracle-checkable — no
  * engine-private hash (xxhash64, DuckDB `hash()`) can be compared across
  * engines.
  *
  * 60 bits fits signed int64 exactly (no unsigned parsing edge cases) and
  * md5 is available + codegen'd in both engines.
  */
object PortableHash {

  /** Large Mersenne-ish prime used as the MinHash universe. */
  val P: Long = 2147483647L // 2^31 - 1

  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The same expression in DuckDB SQL. */
  def hash60Sql(expr: String): String =
    s"CAST(('0x'||substr(md5($expr),1,15)) AS BIGINT)"

  /** JVM-side replica (for deriving plan-time constants — LSH hyperplane
    * and IVF centroid weights). ONE definition of the hash contract; the
    * Column/SQL/JVM forms must stay in lockstep or the hash-derived
    * oracles silently diverge. */
  def hash60String(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Hash-derived weight in [-1, 1] for a geometry label (e.g. "hp3_17",
    * "ivf5_0") — shared by SimilarityLSH planes and SimilarityIVF
    * centroids; both DuckDB replicas re-derive the same formula. */
  def labelWeight(label: String): Double =
    (hash60String(label) % 2001L - 1000L) / 1000.0

  /** MinHash permutation family h_i(x) = (a_i * x + b_i) mod P over
    * x in [0, P). Coefficients are small odd constants so a_i * x stays
    * far below 2^63 (a < 2^20, x < 2^31). Deterministic: both engines and
    * every round use the same family. */
  def perm(i: Int): (Long, Long) = ((2 * i + 1) * 40503L % 1048573L, (i * 97561L + 31L) % P)
}
