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

  /** Portable seeded hash reduced mod 2^31-1 → BIGINT (fits both engines'
    * native integer math). DuckDB twin:
    * `CAST(md5_number_lower(seed || ':' || expr) % 2147483647 AS BIGINT)`.
    */
  def h31(seed: String, c: Column): Column =
    pmod(md5u64(concat(lit(seed), lit(":"), c)), lit(2147483647L).cast("decimal(20,0)"))
      .cast("bigint")

  /** DuckDB SQL text computing exactly `h31(seed, <expr>)`. */
  def h31Sql(seed: String, expr: String): String =
    s"CAST(md5_number_lower('$seed' || ':' || ($expr)) % 2147483647 AS BIGINT)"

  /** Production-scale variant (NOT oracle-replayable): native codegen hash. */
  def fast(seed: String, c: Column): Column =
    pmod(xxhash64(lit(seed), c), lit(2147483647L)).cast("bigint")
}
