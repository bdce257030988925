package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic (r14): one-JVM interleaved A/B of the loop
  * family's per-iteration checkpoint mode — eager (one materialization
  * job per cut, the r13 form) vs lazy (lineage still cut, result stage
  * deferred to the next consumer). Run on g01's exact loop inputs.
  *
  * Run: sbt "Test/runMain graft.R14LoopAbMain <sfDir> [reps] [cpus]"
  */
object R14LoopAbMain {
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

    def g01(eager: Boolean) = {
      val nodes = Tables.events(spark, dir).select(col("user_id").as("id")).distinct()
      val edges = graft.operators.Graph.interactionEdges(spark, dir).withColumn("w", lit(1L))
      graft.operators.Graph.pageRankLoop(nodes, edges, 10, eagerCut = eager)
        .select(col("id").as("user_id"), col("r").as("rank"))
    }
    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    time(g01(true)); time(g01(false))
    val rows = (1 to reps).map { r =>
      val a = time(g01(true)); val b = time(g01(false))
      println(f"[ab] rep $r: g01 eager $a%.3f lazy $b%.3f")
      (a, b)
    }
    def mm(xs: Seq[Double], name: String): Unit =
      println(f"[ab] $name min ${xs.min}%.3f median ${xs.sorted.apply(xs.size / 2)}%.3f")
    mm(rows.map(_._1), "g01 eager")
    mm(rows.map(_._2), "g01 lazy ")
    // Value identity: lazy must be bit-identical to eager.
    val ea = g01(true).orderBy("user_id").collect().map(_.toString)
    val lb = g01(false).orderBy("user_id").collect().map(_.toString)
    println(s"[ab] identical=${ea.sameElements(lb)} rows=${ea.length}")
    spark.stop()
  }
}
