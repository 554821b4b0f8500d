package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic 64-bit hashing.
  *
  * The driver differential-tests every query against DuckDB, so any operator
  * built on hashing (MinHash, SimHash, LSH banding, winnowing fingerprints)
  * needs a hash BOTH engines compute bit-identically. MD5 is the only
  * standardized digest present in both; DuckDB 1.0 exposes
  * `md5_number_lower(s)` = little-endian uint64 of digest bytes 8..15.
  * We reproduce that exact value in Spark by byte-swapping the hex tail of
  * `md5()` and parsing with `conv` (unsigned 64-bit), carried as
  * DECIMAL(20,0) because the value may exceed signed-long range.
  *
  * Scale note: MD5 through string/decimal ops is ~5-10× slower than Spark's
  * native codegen'd `xxhash64`. All operators in graft.ops take the hash as
  * a pluggable `Column => Column`, defaulting to this portable one so the
  * oracle can replay it; a 100 TB production run would pass
  * `PortableHash.fast` (xxhash64) instead — the algorithms are unchanged.
  */
object PortableHash {

  /** Equivalent DuckDB SQL: `md5_number_lower(expr)` (as DECIMAL(20,0)). */
  def md5u64(c: Column): Column = {
    val h = md5(c)
    // little-endian: hex byte pairs 31,29,..,17
    val le = concat((31 to 17 by -2).map(i => substring(h, i, 2)): _*)
    conv(le, 16, 10).cast("decimal(20,0)")
  }

  /** Low 32 bits of md5_number_lower as plain BIGINT — digest bytes 8..11
    * little-endian = hex pairs at 23,21,19,17 concatenated big-endian.
    * Avoids the decimal(20,0) carrier (decimal pmod dominated hash cost).
    */
  private def md5low32(c: Column): Column = {
    val h = md5(c)
    val le = concat(substring(h, 23, 2), substring(h, 21, 2), substring(h, 19, 2), substring(h, 17, 2))
    conv(le, 16, 10).cast("bigint")
  }

  /** Portable seeded 31-bit hash → BIGINT in [0, 2^31). DuckDB twin:
    * `CAST((md5_number_lower(seed || ':' || expr) & 2147483647) AS BIGINT)`.
    */
  def h31(seed: String, c: Column): Column =
    md5low32(concat(lit(seed), lit(":"), c)).bitwiseAND(lit(2147483647L))

  /** DuckDB SQL text computing exactly `h31(seed, <expr>)`. */
  def h31Sql(seed: String, expr: String): String =
    s"CAST((md5_number_lower('$seed' || ':' || ($expr)) & 2147483647) AS BIGINT)"

  /** Production-scale variant (NOT oracle-replayable): native codegen hash. */
  def fast(seed: String, c: Column): Column =
    pmod(xxhash64(lit(seed), c), lit(2147483647L)).cast("bigint")
}
