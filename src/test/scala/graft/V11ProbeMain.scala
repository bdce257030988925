package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, AnnIndex}

/** One-off measurement harness for v11's stage costs at a given SF —
  * not a test; run with `sbt "Test/runMain graft.V11ProbeMain <sfDir>"`. */
object V11ProbeMain {
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
    val e = Tables.embeddings(spark, dir)
    val n = time("count")(e.count())
    val k = AnnIndex.cellCount(n)
    println(s"n=$n k=$k twoLevel=${k > AnnIndex.MaxSingleLevelCells}")
    val model = time("train")(AnnIndex.trainCellModel(e, k))
    val model2 = time("train-again")(AnnIndex.trainCellModel(e, k))
    val cells = e.select(col("vec_id"),
      AnnIndex.cellOfModel(col("embedding"), model).as("cell"), col("embedding"))
    time("assign-count")(cells.count())
    val hist = time("cell-histogram")(
      cells.groupBy(col("cell")).count().agg(
        count(lit(1)), max(col("count")), sum(col("count") * col("count"))).head())
    println(s"distinct cells=${hist.getLong(0)} maxCell=${hist.getLong(1)} sumSq=${hist.getLong(2)}")
    time("pairjoin")(Ann.semDedupDropped(cells, 0.45).count())
    time("semdedup-full")(Ann.semDedup(cells).count())
    time("semdedup-full-2")(Ann.semDedup(cells).count())
    val cellsC = time("checkpoint-cells")(cells.localCheckpoint())
    time("semdedup-ckpt")(Ann.semDedup(cellsC).count())
    time("semdedup-ckpt-2")(Ann.semDedup(cellsC).count())
    val cellsNoEmb = cells.select(col("vec_id"), col("cell"))
    time("assign-only-count")(cellsNoEmb.count())
    spark.stop()
  }
}
