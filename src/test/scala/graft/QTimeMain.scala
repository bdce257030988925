package graft

/** r14 optimization-round instrument: standalone timing of named
  * registered queries under the EXACT Bench session + methodology
  * (warm pass at sf0.001, timed reps at the target SF, min + median),
  * without paying the full 254-query surface per leg. One JVM, queries
  * interleaved across reps so box context cancels between them —
  * the repo's standing A/B discipline (BASELINE.md r11/r14).
  *
  * Run: sbt "Test/runMain graft.QTimeMain <q1,q2,...> [sfDir] [reps]"
  */
object QTimeMain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").filter(_.nonEmpty).toSeq
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      times(n) = times(n) :+ t
      println(f"[qtime] rep $r $n $t%.3f s")
    }
    for (n <- names) {
      val ts = times(n).sorted
      println(f"[qtime] SUMMARY $n min ${ts.head}%.3f s median ${ts(ts.size / 2)}%.3f s")
    }
    spark.stop()
  }
}
