package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic (r14): stage attribution for d02_dedup_minhash.
  *
  * JoinProbeMain showed d02's plan is flip-FREE (10/10 reps at sf0.1
  * and sf1.0: all three joins BHJ, zero shuffles), so the r13 "weak"
  * verdict's residual is a wall question, not a plan question. This
  * main times the cascade cumulatively in one JVM:
  *
  *   stage A — documents scan + minhash band table (shingling + 32
  *             hash evaluations per doc: the CPU kernel);
  *   stage B — A + band self-join + first-matching-band filter
  *             (the candidate pairs);
  *   stage C — the full registered d02 (B + exact-Jaccard verify).
  *
  * Run: sbt "Test/runMain graft.D02ProbeMain <sfDir> [reps]"
  */
object D02ProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Lsh

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    def bandTable = Lsh.minhashBandTable(Tables.documents(spark, dir), 3, 8, 4)
    def cands = {
      val buckets = bandTable
      buckets.as("a").join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
            && col("a.doc_id") < col("b.doc_id"))
        .filter(col("a.band") === Lsh.firstMatchingBandArrays(col("a.bsig"), col("b.bsig")))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    }
    def full = SparkEntry.queries("d02_dedup_minhash")(spark, dir)

    // Warm every plan shape once (JIT + codegen), then timed reps.
    bandTable.queryExecution.toRdd.count()
    cands.queryExecution.toRdd.count()
    full.queryExecution.toRdd.count()
    for (r <- 1 to reps) {
      val (ta, na) = time(bandTable.queryExecution.toRdd.count())
      val (tb, nb) = time(cands.queryExecution.toRdd.count())
      val (tc, nc) = time(full.queryExecution.toRdd.count())
      println(f"[d02] rep $r: bandTable ${ta}%.3f s ($na rows)  " +
        f"+selfjoin ${tb}%.3f s ($nb cands)  full ${tc}%.3f s ($nc pairs)")
    }
    spark.stop()
  }
}
