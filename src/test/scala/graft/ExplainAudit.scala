package graft

/** Ad-hoc explain audit over registered queries: prints codegen-span /
  * exchange / parquet-scan counts plus the plan head for each name
  * passed on the command line — the quick loop for checking a new
  * operator's executed shape against its scaladoc claims.
  * Run: sbt "Test/runMain graft.ExplainAudit t36_gopher_rules ..."
  * An argument containing '/' overrides the corpus dir (default:
  * TestSpark.sf — the same data every spec runs against). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.find(_.contains("/")).getOrElse(TestSpark.sf)
    for (n <- args if !n.contains("/")) {
      val df = SparkEntry.queries(n)(spark, dir)
      // Execute first: an AQE plan prints no codegen stars (and may
      // re-plan joins) until it is final — auditing the pre-execution
      // tree under-reports spans and shows never-taken join choices.
      df.queryExecution.toRdd.count()
      // Final plan only — the AQE treeString appends an "== Initial
      // Plan ==" section that would double every count.
      val p = df.queryExecution.executedPlan.treeString
        .split("== Initial Plan ==")(0)
      // Distinct codegen-span IDS, not operator lines: every operator
      // inside span N prints a "*(N)" prefix, so counting lines would
      // report operators and mis-grade "one kernel pass" claims.
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
      val ex = p.linesIterator.count(_.contains("Exchange"))
      val scans = p.linesIterator.count(_.contains("Scan parquet"))
      println(s"[audit] $n codegen_spans=$wsc exchanges=$ex parquet_scans=$scans")
      println(p.linesIterator.take(12).mkString("\n"))
      println("----")
    }
    spark.stop()
  }
}
