package graft

/** Throwaway diagnostic (r14): one-JVM interleaved A/B of gramIndex's
  * cold posting stream — checkpointed once vs re-executed per consumer
  * (the count window runs for the join's a-side, b-side and the
  * hotCnt aggregate; its exchange may be reused but the window sort +
  * filter re-run). Measured on the d04 shape (jac 1/5) and the
  * ccLabels edge shape (jac 9/10).
  *
  * Run: sbt "Test/runMain graft.R14GramAbMain <sfDir> [reps] [cpus]"
  */
object R14GramAbMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = args.drop(2).headOption.getOrElse("32")
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

    def d04(ckpt: Boolean) =
      graft.operators.Dedup.probeNgramPairs(spark, dir, 1, 5, ckpt)
    def edges(ckpt: Boolean) =
      graft.operators.Dedup.probeNgramPairs(spark, dir, 9, 10, ckpt)

    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    time(d04(true)); time(d04(false)); time(edges(true)); time(edges(false))
    val rows = (1 to reps).map { r =>
      val da = time(d04(true)); val db = time(d04(false))
      val ea = time(edges(true)); val eb = time(edges(false))
      println(f"[ab] rep $r: d04 ckpt $da%.3f nockpt $db%.3f | edges ckpt $ea%.3f nockpt $eb%.3f")
      (da, db, ea, eb)
    }
    def mm(xs: Seq[Double], name: String): Unit =
      println(f"[ab] $name min ${xs.min}%.3f median ${xs.sorted.apply(xs.size / 2)}%.3f")
    mm(rows.map(_._1), "d04 ckpt    ")
    mm(rows.map(_._2), "d04 nockpt  ")
    mm(rows.map(_._3), "edges ckpt  ")
    mm(rows.map(_._4), "edges nockpt")
    spark.stop()
  }
}
