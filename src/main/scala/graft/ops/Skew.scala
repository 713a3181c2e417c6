package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) splits
  * oversized partitions at runtime for sort-merge joins; explicit
  * salting is the deterministic fallback when a handful of keys dominate
  * (the classic power-law user_id / null-key cases at 100 TB).
  *
  * Shape: the large side spreads each hot key over `salts` sub-keys via
  * a content hash; the smaller side replicates each row `salts` times.
  * Join runs on (key, salt) — the hot key's rows now land on `salts`
  * tasks instead of one. */
object Skew {

  /** Inner equi-join of `big` and `small` on `key`, salted `salts` ways.
    * `spreadBy` drives the salt for the big side — any column(s) that
    * vary within a key (a row id, a timestamp); kept deterministic so
    * results are reproducible. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      spreadBy: Column,
      salts: Int = 8): DataFrame = {
    val b = big.withColumn("__salt", pmod(xxhash64(spreadBy), lit(salts.toLong)))
    val s = small.withColumn("__salt", explode(typedlit((0L until salts.toLong).toSeq)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
