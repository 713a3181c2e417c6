package graft.ops

import graft.plans.{AsOfJoin, AsOfJoinStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftshim.CatalystBridge

/** User-facing as-of join API over the custom operator stack
  * ([[graft.plans.AsOfJoin]] logical node → [[AsOfJoinStrategy]] →
  * AsOfJoinExec merge). Column arguments are names, resolved against
  * each side's analyzed plan (the sides keep distinct attribute ids, so
  * duplicate names across sides are fine — project/rename beforehand if
  * you need both in the output). */
object AsOf {

  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Left-outer as-of join: each left row gets the right row with the
    * greatest rightTime <= leftTime within the same key. */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = CatalystBridge.analyzed(left)
    val rp = CatalystBridge.analyzed(right)
    def resolve(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
    CatalystBridge.ofRows(spark,
      AsOfJoin(lp, rp,
        resolve(lp, leftKey), resolve(rp, rightKey),
        resolve(lp, leftTime), resolve(rp, rightTime)))
  }
}
