package graft
object AuditMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.1"
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, sf)
      df.collect() // finalize the adaptive plan so codegen spans are real
      val plan = df.queryExecution.executedPlan.treeString
      val scans = plan.linesIterator.filter(_.contains("FileScan")).map(_.take(200)).toList
      println(s"==== $n ====")
      println("  broadcasts=" + plan.linesIterator.count(_.contains("BroadcastHashJoin"))
        + " smj=" + plan.linesIterator.count(_.contains("SortMergeJoin"))
        + " shuffles=" + plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
        + " wscg_spans=" + "\\*\\(\\d+\\)".r.findAllIn(plan).map(_.toString).toSet.size
        + " takeOrdered=" + plan.linesIterator.count(_.contains("TakeOrderedAndProject")))
      scans.foreach(s => println("  scan: " + s.dropWhile(_ != 'F').take(60) + " ..."))
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toList
      val schema = "ReadSchema: [^,\\n]*".r.findAllIn(plan).take(3).toList
      pushed.foreach(p => println("  " + p.take(120)))
      schema.foreach(p => println("  " + p.take(140)))
    }
    spark.stop()
  }
}
