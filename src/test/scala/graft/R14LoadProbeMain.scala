package graft

/** Throwaway diagnostic (r14): what does a bare `spark.read.parquet`
  * DataFrame CREATION cost (listing + footer schema inference), vs
  * reusing the DataFrame object — the per-query fixed overhead every
  * Tables.load pays on each of the bench's ~1000 query evaluations.
  *
  * Run: sbt "Test/runMain graft.R14LoadProbeMain <sfDir> [n]"
  */
object R14LoadProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (tbl <- Seq("lineitem", "documents", "events", "embeddings", "orders")) {
      // warm (JIT + FS cache)
      spark.read.parquet(s"$dir/$tbl.parquet")
      val create = (1 to n).map(_ => t(spark.read.parquet(s"$dir/$tbl.parquet")))
      val df = spark.read.parquet(s"$dir/$tbl.parquet")
      val reuseSel = (1 to n).map(_ => t(df.select("*")))
      val createCount = (1 to 3).map(_ =>
        t(spark.read.parquet(s"$dir/$tbl.parquet").count()))
      val reuseCount = (1 to 3).map(_ => t(df.count()))
      println(f"[load] $tbl%-10s create ${create.min}%.4f/${create.sorted.apply(n / 2)}%.4f s  " +
        f"reuse-select ${reuseSel.min}%.4f  " +
        f"create+count ${createCount.min}%.4f  reuse+count ${reuseCount.min}%.4f")
    }
    spark.stop()
  }
}
