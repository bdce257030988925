import org.apache.spark.sql.{DataFrame, SparkSession}

/** `graft.sql(spark, "...")` — the library's single-string statement
  * surface; see [[graft.GraftSql]] for the routing table. */
package object graft {
  def sql(spark: SparkSession, text: String,
      params: Map[String, Any] = Map.empty): DataFrame =
    GraftSql.run(spark, text, params)
}
