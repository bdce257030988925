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
    // r14: warm per-rep decomposition of the REGISTERED query — sym
    // (bigram extraction + groupBy: the data-bound stage) vs the full
    // query (sym + the fixed-overhead loop + ranking), interleaved so
    // box context cancels. The loop runs over a ~31-node keyword graph
    // at every SF, so its cost is pure job-scheduling overhead; if the
    // full-vs-sym gap moves across rounds the mover is scheduling
    // context, not the plan.
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    def symOnly(): Long = {
      val ws2 = Tables.documents(spark, dir).select(split(col("text"), " ").as("ws"))
      ws2.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), " +
            "i -> struct(element_at(ws, i + 1) AS w1, element_at(ws, i + 2) AS w2))")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .filter(col("w1") =!= col("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .select(least(col("w1"), col("w2")).as("u"),
          greatest(col("w1"), col("w2")).as("v"), col("c"))
        .groupBy(col("u"), col("v")).agg(sum(col("c")).as("w"))
        .filter(col("w") >= 3)
        .queryExecution.toRdd.count()
    }
    def full(): Long =
      SparkEntry.queries("t20_textrank")(spark, dir).queryExecution.toRdd.count()
    symOnly(); full() // warm
    for (r <- 1 to reps) {
      val t0 = System.nanoTime(); symOnly()
      val ts = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); full()
      val tf = (System.nanoTime() - t1) / 1e9
      println(f"[t20] rep $r: sym ${ts}%.3f s  full ${tf}%.3f s  loop+rank ${tf - ts}%.3f s")
    }
    // Loop-overhead matrix: the keyword graph is ~31 nodes at sf0.1, so
    // the loop's wall is pure scheduling — how much of it is AQE
    // per-stage latency vs task-count?
    def loopOnce(): Unit =
      graft.operators.Graph.pageRankLoop(nodes, edges, 10,
        dangling = false, cutEvery = 5)
        .orderBy(col("r").desc, col("id").asc).limit(30).count()
    for (aqe <- Seq("true", "false"); parts <- Seq("32", "1")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      loopOnce() // warm this config's plan shapes
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); loopOnce(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[t20] loop aqe=$aqe parts=$parts: min ${walls.min}%.3f s " +
        f"(${walls.map(w => f"$w%.2f").mkString(",")})")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // Pre-partitioned loop variant: edgesW hashed by src and nodes by id
    // ONCE before the loop, so each iteration shuffles only the rank
    // stream — the at-scale fix (re-shuffling the edge list per
    // iteration is the classic pagerank-on-Spark mistake). A/B vs the
    // library loop in this same JVM.
    def loopPre(): Unit = {
      val nodesC = nodes.repartition(col("id")).localCheckpoint()
      val edgesC = edges.localCheckpoint()
      val deg = edgesC.groupBy(col("src")).agg(sum(col("w")).as("wdeg")).localCheckpoint()
      val edgesW = edgesC.join(deg, "src")
        .repartition(col("src")).localCheckpoint()
      val nn = nodesC.agg(count(lit(1)).cast("double").as("n"))
      var ranks = nodesC.crossJoin(nn)
        .select(col("id"), (lit(1.0) / col("n")).as("r")).localCheckpoint()
      for (i <- 1 to 10) {
        val contribs = edgesW
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst")).agg(sum(col("r") * col("w") / col("wdeg")).as("cin"))
        ranks = nodesC.crossJoin(nn)
          .join(contribs, col("id") === col("dst"), "left")
          .select(col("id"), (floor((lit(0.15) / col("n") +
            lit(0.85) * coalesce(col("cin"), lit(0.0))) * 1000000000L + 0.5) / 1000000000L).as("r"))
        if (i % 5 == 0 || i == 10) ranks = ranks.localCheckpoint()
      }
      ranks.orderBy(col("r").desc, col("id").asc).limit(30).count()
    }
    loopOnce(); loopPre() // warm
    for (r <- 1 to 3) {
      val t0 = System.nanoTime(); loopOnce()
      val ta = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); loopPre()
      val tb = (System.nanoTime() - t1) / 1e9
      println(f"[t20] rep $r: loop-lib ${ta}%.3f s  loop-prepart ${tb}%.3f s")
    }
    spark.stop()
  }
}
