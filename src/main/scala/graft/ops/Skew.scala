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

  /** Hot-key-only salting: blanket salting replicates the whole small
    * side `salts`×, but in the power-law reality only a handful of keys
    * are hot. Single-pass formulation: each side gets a broadcast
    * hot-key flag; the big side salts hot rows (cold rows take salt 0),
    * the small side replicates ONLY hot rows across all salts (cold
    * rows take the one-element salt list) — then one equi-join on
    * (key, salt). No semi/anti split, no union, each input read once.
    * The hot-key set is exact (one aggregated pass over the big side's
    * keys, map-side combined, broadcast back); at extreme scale the
    * same set can come from a sample instead. Results are identical to
    * `big.join(small, key)` for any threshold. */
  def saltedJoinHot(
      big: DataFrame,
      small: DataFrame,
      key: String,
      spreadBy: Column,
      salts: Int = 8,
      hotThreshold: Long = 1000000L): DataFrame = {
    val hot = big.groupBy(key).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > hotThreshold)
      .select(col(key), lit(true).as("__hot"))
    val b = big.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(xxhash64(spreadBy), lit(salts.toLong))).otherwise(0L))
      .drop("__hot")
    val s = small.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), typedlit((0L until salts.toLong).toSeq))
          .otherwise(typedlit(Seq(0L)))))
      .drop("__hot")
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
