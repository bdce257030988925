package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB regime.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) handles most skew at runtime by splitting oversized
  * partitions. Salting is the explicit fallback for the cases AQE cannot
  * fix: a single join key so hot that *one key* exceeds an executor
  * (power-law user_ids, null-heavy keys) — AQE can split a partition, but
  * every replica of a hot key must still meet every matching row.
  *
  * `saltedJoin` implements the standard replicate-and-salt scheme:
  * the large side gets a random salt in [0, buckets); the small-ish side
  * is replicated `buckets` times; joining on (key, salt) spreads each hot
  * key over `buckets` tasks. Equi-join semantics are preserved exactly
  * (inner joins only — replicating an outer side would duplicate
  * non-matches).
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, with the hot keys of
    * `large` spread across `buckets` tasks. `small` is replicated
    * `buckets`× (keep it the dimension-ish side). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val salted = large.withColumn("__salt", (rand(seed = 7) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for a hot group key.
    * Catalyst's hash aggregate already does map-side partial combine; this
    * form additionally breaks a single hot *reduce* key across `buckets`
    * reducers — use when one group dominates (e.g. count by a 5-value
    * column at 100 TB). `aggs` must be decomposable (sum/count/min/max). */
  def saltedCount(df: DataFrame, key: Column, buckets: Int): DataFrame =
    df.groupBy(key.as("k"), (rand(seed = 7) * buckets).cast("int").as("__salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))
}
