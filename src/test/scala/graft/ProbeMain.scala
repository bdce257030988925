package graft
import org.apache.spark.sql.SparkSession
object ProbeMain {
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
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(spark, args(0)).count()
        println(f"[probe] $q rows=$n ${(System.nanoTime()-t0)/1e9}%.1f s")
      } catch { case e: Throwable =>
        println(s"[probe] $q FAILED: ${e.getClass.getName}: ${e.getMessage}")
        var c = e.getCause
        while (c != null) { println(s"  cause: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause }
      }
    }
    spark.stop()
  }
}
