package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.{cosine, hyperplaneSig}

/** Scratch experiment: recall/candidate-count of banded hyperplane LSH for
  * the d05 embedding near-dup threshold (cos ≥ 0.45), vs all-pairs truth.
  *
  * Mode 1 (default): the round-7 band-join sweep over single-word
  * geometries (kept for the record).
  *
  * Mode 2 (`export <sfDir> <outPath>`): dump the ALL-PAIRS
  * (xor1, xor2, cos) table for a corpus — xor of two independent 63-bit
  * hyperplane signature words per pair, plus exact cosine — so any
  * (bandBits, nBands, hammingProbe, words) geometry can be evaluated
  * OFFLINE with pure bit arithmetic (popcount per band group ≤ h),
  * no join per geometry. 2000 vectors → 2M pairs ≈ 50 MB; the sweep
  * then runs in seconds per geometry instead of a Spark job each.
  * Run: sbt "Test/runMain graft.LshProbeMain export /root/testdata/sf0.1 /tmp/d05_pairs"
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

    if (args.length >= 1 && args(0) == "export") {
      val sfDir = args(1); val out = args(2)
      val e = Tables.embeddings(spark, sfDir)
        .withColumn("s1", hyperplaneSig(col("embedding"), 63))
        .withColumn("s2", hyperplaneSig(col("embedding"), 63, 63))
        .select(col("vec_id"), col("embedding"), col("s1"), col("s2"))
        .cache()
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("s1").as("sa1"), col("s2").as("sa2"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("s1").as("sb1"), col("s2").as("sb2"))
      a.join(b, col("a_id") < col("b_id"))
        .select(
          col("sa1").bitwiseXOR(col("sb1")).as("x1"),
          col("sa2").bitwiseXOR(col("sb2")).as("x2"),
          cosine(col("ea"), col("eb")).as("cs"))
        .write.mode("overwrite").parquet(out)
      println(s"exported all-pairs xor/cos table for $sfDir to $out")
      spark.stop(); return
    }

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
