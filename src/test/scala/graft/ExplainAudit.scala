package graft

/** Ad-hoc explain audit over registered queries: prints codegen-span /
  * exchange / parquet-scan counts plus the plan head for each name
  * passed on the command line — the quick loop for checking a new
  * operator's executed shape against its scaladoc claims.
  * Run: sbt "Test/runMain graft.ExplainAudit t36_gopher_rules ..." */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      val p = df.queryExecution.executedPlan.treeString
      val wsc = p.linesIterator.count(l => l.contains("WholeStageCodegen") || l.trim.startsWith("*("))
      val ex = p.linesIterator.count(_.contains("Exchange"))
      val scans = p.linesIterator.count(_.contains("Scan parquet"))
      println(s"[audit] $n codegen_nodes=$wsc exchanges=$ex parquet_scans=$scans")
      println(p.linesIterator.take(12).mkString("\n"))
      println("----")
    }
    spark.stop()
  }
}
