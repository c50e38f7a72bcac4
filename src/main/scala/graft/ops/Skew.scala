package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north_rule: "skew handled explicitly") for the
  * cases AQE can't fix: a shuffle join whose key distribution has hot
  * keys ("CNN" appears in 20% of all pages) on BOTH sides, or an
  * aggregation whose single hot group exceeds one reducer.
  *
  * Salting: the fact side gets `salt = pmod(xxhash64(saltBy), nSalts)`
  * appended to its join key; the dimension side is replicated nSalts
  * times. The join explodes uniform keys by nothing (dimension rows are
  * few) and splits hot keys across nSalts reducers.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side salted
    * by a stable hash of `saltBy` (e.g. the row's url) and the small side
    * replicated. Result columns = big.* ++ small.* (minus the join key
    * duplicate), identical to `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: String, nSalts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(saltBy)), lit(nSalts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for hot groups: partial-aggregate on
    * (key, salt) first, then final on key. `aggs` must be decomposable
    * (sum/count/min/max — pass the partial column names). */
  def saltedSum(df: DataFrame, key: Seq[String], valueCol: String,
      saltBy: String, nSalts: Int = 16): DataFrame = {
    val keyCols = key.map(col)
    df.withColumn("__salt", pmod(xxhash64(col(saltBy)), lit(nSalts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
