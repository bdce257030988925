package graft

import org.apache.spark.sql.SparkSession

/** g09 hub-cap sweep: times Graph.neighborJaccard at capDeg ∈
  * {128, 256, 512} over the scale-smoke corpus so the cap's cost knee is
  * documented where a user will look (Graph.scala Scaladoc + BASELINE.md).
  * Run: sbt "Test/runMain graft.G09CapProbeMain [corpusDir]" — defaults
  * to the ScaleSmokeMain cache (regenerate with ScaleSmokeMain first if
  * absent). */
object G09CapProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_smoke_v3")
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm pass so JIT/codegen don't land on the first measured cap.
    graft.operators.Graph.neighborJaccard(spark, dir, capDeg = 64).count()
    for (cap <- Seq(128L, 256L, 512L)) {
      val t0 = System.nanoTime()
      val out = graft.operators.Graph.neighborJaccard(spark, dir, capDeg = cap)
      val n = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // Pair work proxy: rows surviving the >= minJac filter plus the
      // raw co-neighbor pair count at this cap.
      val pairs = graft.operators.Graph.neighborJaccard(spark, dir,
        capDeg = cap, minJac = 0.0).count()
      println(f"[g09cap] cap=$cap%4d out_rows=$n%8d pair_rows=$pairs%9d wall=$secs%.2f s")
    }
    spark.stop()
  }
}
