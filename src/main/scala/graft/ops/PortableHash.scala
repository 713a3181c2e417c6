package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable 32-bit hash: the first 8 hex chars of md5, read as
  * an integer. Both Spark and DuckDB compute md5 over UTF-8 bytes
  * identically, so any sketch/signature built from this hash can be
  * replayed hash-for-hash by the DuckDB oracle — the trick behind the
  * fully-verified count-min sketch, SimHash, and MinHash queries.
  * (The native xxhash64-based expressions stay the 100 TB hot path;
  * this is the correctness-witness spelling.) */
object PortableHash {
  def hexHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Same hash, DuckDB spelling. */
  def hexHashSql(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 8)) AS BIGINT)"
}
