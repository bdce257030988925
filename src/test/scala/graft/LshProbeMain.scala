package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.{cosine, hyperplaneSig}

/** Scratch experiment: recall/candidate-count of banded hyperplane LSH for
  * the d05 embedding near-dup threshold (cos ≥ 0.45), vs all-pairs truth.
  * Run: sbt "Test/runMain graft.LshProbeMain"  (not part of the library)
  */
object LshProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("lsh-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")).cache()
      val n = e.count()
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
      val truth = a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), cosine(col("ea"), col("eb")).as("cs"))
        .filter(col("cs") >= 0.45)
        .select("a_id", "b_id").cache()
      val nTrue = truth.count()
      println(s"== $sf n=$n truePairs=$nTrue")

      for ((bandBits, nBands) <- Seq((2, 32), (3, 21), (4, 16), (5, 12), (6, 10), (8, 8))) {
        val banded = e
          .withColumn("sig", hyperplaneSig(col("embedding"), bandBits * nBands))
          .select(col("vec_id"),
            explode(graft.operators.Lsh.bandStructs(col("sig"), bandBits, nBands)).as("bs"))
          .select(col("vec_id"), col("bs.band").as("band"), col("bs.bv").as("bv"))
        val cands = banded.as("x").join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.bv") === col("y.bv")
              && col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
          .distinct().cache()
        val nCand = cands.count()
        val hit = truth.join(cands, Seq("a_id", "b_id")).count()
        val allPairs = n * (n - 1) / 2
        println(f"  b=$bandBits%d L=$nBands%2d cand=$nCand%9d (${nCand * 100.0 / allPairs}%5.1f%% of pairs) recall=$hit%d/$nTrue%d")
        cands.unpersist()
      }
      e.unpersist(); truth.unpersist()
    }
    spark.stop()
  }
}
