package graft

import org.apache.spark.sql.DataFrame

/** The reference's EXPLAIN surface (andb/sql/parser/lexer.py:18,
  * andb/executor/operator/physical/utility.py ExplainOperator) as a
  * library call: the optimized + physical plan of any graft query, one
  * line per row, so EXPLAIN output is itself queryable. */
object Explain {

  def plan(df: DataFrame, mode: String = "formatted"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val text = mode match {
      case "formatted" => df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      case "extended" => df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode)
      case _ => df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    }
    text.linesIterator.toSeq.toDF("plan_line")
  }

  /** EXPLAIN for a registered query by name, e.g.
    * `Explain.query(spark, "q25_tpch_q1", sfDir)`. */
  def query(spark: org.apache.spark.sql.SparkSession, name: String, sfDir: String): DataFrame =
    plan(SparkEntry.queries(name)(spark, sfDir))
}
