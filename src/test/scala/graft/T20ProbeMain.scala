package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off t20 stage-cost probe — run with
  * `sbt "Test/runMain graft.T20ProbeMain <sfDir>"`. */
object T20ProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // Reproduce t20's stages
    val ws = Tables.documents(spark, dir).select(split(col("text"), " ").as("ws"))
    val bi = ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> struct(element_at(ws, i + 1) AS w1, element_at(ws, i + 2) AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val sym = time("sym-build+ckpt") {
      val s0 = bi
        .select(least(col("w1"), col("w2")).as("u"),
          greatest(col("w1"), col("w2")).as("v"), col("c"))
        .groupBy(col("u"), col("v")).agg(sum(col("c")).as("w"))
        .filter(col("w") >= 3)
        .localCheckpoint()
      println(s"sym rows=${s0.count()}")
      s0
    }
    val edges = sym.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .union(sym.select(col("v").as("src"), col("u").as("dst"), col("w")))
    val nodes = edges.select(col("src").as("id")).distinct()
    println(s"nodes=${nodes.count()} edges=${edges.count()}")
    for (ce <- Seq(2, 5, 10)) {
      time(s"loop-cutEvery-$ce")(
        graft.operators.Graph.pageRankLoop(nodes, edges, 10,
          dangling = false, cutEvery = ce)
          .orderBy(col("r").desc, col("id").asc).limit(30).count())
    }
    spark.stop()
  }
}
