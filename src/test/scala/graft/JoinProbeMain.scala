package graft

/** Throwaway diagnostics (r13).
  *
  * `JoinProbeMain <query> <sfDir> [reps]` — execute the query and print
  * every join line of the FINAL (post-AQE) executed plan, per rep: which
  * physical join ran, and what each flip candidate's build side was.
  * Built to identify WHICH of d04/d16's six joins straddles the AQE
  * broadcast boundary at sf1.0 (audit tables only carry counts).
  */
object JoinProbeMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = TestSpark.spark
    for (r <- 1 to reps) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count()
      val p = df.queryExecution.executedPlan.treeString
        .split("== Initial Plan ==")(0)
      println(s"[jp] ==== rep $r ====")
      p.linesIterator.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Join") || l.contains("BroadcastExchange"))
          println(s"[jp] $i: ${l.trim.take(200)}")
      }
    }
    spark.stop()
  }
}
