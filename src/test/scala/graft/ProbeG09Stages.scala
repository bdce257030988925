package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic (r11): g09's stage populations and join-stage
  * wall across SFs — is the candidate stream exactly linear in
  * replicas, and which stage carries the octave constant? */
object ProbeG09Stages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val und = graft.operators.Graph.probeUndirectedEdges(spark, d).localCheckpoint()
      val adj = und // cap never binds on these corpora (maxDeg 185)
      val inc = adj.select(col("u").as("w"), col("v").as("n"))
        .union(adj.select(col("v").as("w"), col("u").as("n"))).localCheckpoint()
      val t0 = System.nanoTime()
      // The join WITHOUT the pair aggregate: raw co-neighbor stream size.
      val raw = inc.as("l").join(inc.as("r"),
        col("l.w") === col("r.w") && col("l.n") < col("r.n")).count()
      val tJoin = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = inc.as("l").join(inc.as("r"),
          col("l.w") === col("r.w") && col("l.n") < col("r.n"))
        .groupBy(col("l.n"), col("r.n")).agg(count(lit(1))).count()
      val tAgg = (System.nanoTime() - t1) / 1e9
      println(f"[g09probe] $d inc=${inc.count()} rawCand=$raw distinctPairs=$pairs joinCount=$tJoin%.1f s join+agg=$tAgg%.1f s")
    }
    spark.stop()
  }
}
