package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic (r14): one-JVM interleaved A/B of d02's band
  * table materialization — checkpoint (kernel once) vs recompute
  * (kernel per join side). Interleaved reps so box context cancels.
  *
  * Run: sbt "Test/runMain graft.D02AbMain <sfDir> [reps] [cpus]"
  */
object D02AbMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = args.drop(2).headOption.getOrElse("32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Lsh

    // A = the library's current d02 (ckpt band table + id-restricted
    // verify); B = ckpt band table + UNRESTRICTED verify (whole-corpus
    // shingling, the pre-r14 form) — isolates the verify pushdown.
    def variant(restricted: Boolean) = {
      val docsT = Tables.documents(spark, dir)
      val buckets = Lsh.minhashBandTable(docsT, 3, 8, 4).localCheckpoint()
      val cands = buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
            && col("a.doc_id") < col("b.doc_id"))
        .filter(col("a.band") === Lsh.firstMatchingBandArrays(col("a.bsig"), col("b.bsig")))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      if (restricted) Lsh.jaccardVerifiedPairs(cands, docsT, 0.9)
      else {
        val hs = docsT.select(col("doc_id"),
          org.apache.spark.sql.graft.TextHash.shingleHashSet(col("text")).as("hs"))
        Lsh.jaccardVerifiedPairsHs(cands, hs, hs, 0.9)
      }
    }
    def time(restricted: Boolean): Double = {
      val t0 = System.nanoTime()
      variant(restricted).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    time(true); time(false) // warm both shapes
    val (as, bs) = (1 to reps).map { r =>
      val a = time(true); val b = time(false)
      println(f"[ab] rep $r: restricted ${a}%.3f s  full-hs ${b}%.3f s")
      (a, b)
    }.unzip
    println(f"[ab] min: restricted ${as.min}%.3f s  full-hs ${bs.min}%.3f s  " +
      f"median: restricted ${as.sorted.apply(reps / 2)}%.3f s  " +
      f"full-hs ${bs.sorted.apply(reps / 2)}%.3f s")
    spark.stop()
  }
}
