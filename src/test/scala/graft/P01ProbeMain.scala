package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of p01 on the scale-smoke corpus. */
object P01ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("p01-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/tmp/graft_scale_smoke"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.1f s  rows=$n")
    }
    val stop = Seq("the", "a", "of", "and", "is")
    def norm = Tables.documents(spark, d)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm_text"))
      .select(col("doc_id"), col("norm_text"), split(col("norm_text"), " ").as("w"))
      .select(col("doc_id"), col("norm_text"),
        size(col("w")).cast("long").as("n_words"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("ttr"),
        (size(filter(col("w"), x => x.isInCollection(stop))).cast("double") / size(col("w")))
          .as("stop_ratio"))
      .withColumn("quality",
        least(lit(1.0), col("n_words").cast("double") / 100.0) * 0.5
          + col("ttr") * 0.3 + (lit(1.0) - col("stop_ratio")) * 0.2)
    time("normalize only")(Tables.documents(spark, d)
      .select(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")).as("t"))
      .count())
    time("norm+features")(norm.count())
    time("norm+features+gate")(norm.filter(col("quality") >= 0.5).count())
    time("…+window keeper") {
      val q = norm.filter(col("quality") >= 0.5)
      q.withColumn("keeper_id", min(col("doc_id")).over(Window.partitionBy(md5(col("norm_text")))))
        .filter(col("doc_id") === col("keeper_id")).count()
    }
    spark.stop()
  }
}
