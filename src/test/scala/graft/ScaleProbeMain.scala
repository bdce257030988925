package graft
import org.apache.spark.sql.SparkSession

/** Scratch: time named queries at a given SF dir on local[32] — the
  * single-operator probe used while chasing big-SF bench tails.
  * Run: sbt "Test/runMain graft.ScaleProbeMain <dir> <names-csv> [reps]" */
object ScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"$n rep$r ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c")
    }
    spark.stop()
  }
}
