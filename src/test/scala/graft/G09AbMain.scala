package graft

/** r15 instrument: one-JVM interleaved A/B of g09's degree-ratio
  * prefilter (verdict item 1) vs the r13/r14 shape, plus an in-JVM
  * value-equality check (both variants collected and compared row-set
  * exact at the target SF before any timing is reported).
  *
  * Run: sbt "Test/runMain graft.G09AbMain <sfDir> [reps] [cpus]"
  */
object G09AbMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(7)
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

    // A = registered default (partitioned self-join), B = r14 shape
    // (unpartitioned), C = partitioned + degree prefilter.
    def g09(pref: Boolean, part: Boolean) =
      graft.operators.Graph.neighborJaccard(spark, dir,
        degPrefilter = pref, partitionedJoin = part)

    // Value gate FIRST: all variants must agree row-set exact.
    val a = g09(false, true).collect().map(_.toString).sorted.toSeq
    val b = g09(false, false).collect().map(_.toString).sorted.toSeq
    val c = g09(true, true).collect().map(_.toString).sorted.toSeq
    require(a == b && a == c,
      s"VALUE MISMATCH: part=${a.size} old=${b.size} pref=${c.size} rows; " +
      s"firstDiff=${a.zip(b).find(p => p._1 != p._2)}")
    println(s"[g09ab] value gate: ${a.size} rows identical across 3 variants")

    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    time(g09(false, true)); time(g09(false, false)); time(g09(true, true))
    val rows = (1 to reps).map { r =>
      val pa = time(g09(false, true)); val pb = time(g09(false, false))
      val pc = time(g09(true, true))
      println(f"[g09ab] rep $r: parted $pa%.3f old $pb%.3f parted+pref $pc%.3f")
      (pa, pb, pc)
    }
    def mm(xs: Seq[Double], name: String): Unit =
      println(f"[g09ab] $name min ${xs.min}%.3f median ${xs.sorted.apply(xs.size / 2)}%.3f")
    mm(rows.map(_._1), "parted     ")
    mm(rows.map(_._2), "old        ")
    mm(rows.map(_._3), "parted+pref")
    spark.stop()
  }
}
