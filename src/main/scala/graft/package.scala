import org.apache.spark.sql.{DataFrame, SparkSession}

/** `graft.sql(spark, "...")` — the library's single-string statement
  * surface; see [[graft.GraftSql]] for the routing table. */
package object graft {
  def sql(spark: SparkSession, text: String,
      params: Map[String, Any] = Map.empty): DataFrame =
    GraftSql.run(spark, text, params)

  /** Unpersist the localCheckpoint block backing a (possibly projected)
    * checkpointed DataFrame. A long-lived session that checkpoints per
    * iteration/fold and never frees the superseded blocks grows executor
    * memory linearly (the Graph CC-loop lesson, r11) — callers drop each
    * checkpoint as soon as nothing downstream can still read it. Safe
    * only when every consumer of the checkpoint has already materialized
    * (localCheckpoint is eager, so the block itself always exists before
    * this runs; the caller guarantees no LAZY plan still points at it). */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
