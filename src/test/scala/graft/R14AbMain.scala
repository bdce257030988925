package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic (r14): one-JVM interleaved A/B of the two
  * optimization candidates whose cross-JVM standalone legs were
  * ambiguous (box swing ±25%):
  *   g09  — cdeg materialized once vs recomputed per join side;
  *   q86  — two-level (orderkey, suppkey) pre-dedup vs double
  *          countDistinct (the Expand plan).
  * Interleaved reps so box context cancels (the D02AbMain pattern).
  *
  * Run: sbt "Test/runMain graft.R14AbMain <sfDir> [reps] [cpus]"
  */
object R14AbMain {
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

    def g09(ckpt: Boolean) =
      graft.operators.Graph.neighborJaccard(spark, dir, ckptCdeg = ckpt)

    def q86(twoLevel: Boolean) = {
      val li = Tables.lineitem(spark, dir)
      val perOrder =
        if (twoLevel)
          li.groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
            .agg(max((col("l_returnflag") === "R").cast("long")).as("has_r"))
            .groupBy(col("ok"))
            .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_fault"))
        else
          li.groupBy(col("l_orderkey").as("ok"))
            .agg(countDistinct(col("l_suppkey")).as("n_supp"),
              countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
                .as("n_fault"))
      li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
        .join(perOrder, col("l_orderkey") === col("ok"))
        .filter(col("n_supp") >= 2 && col("n_fault") === 1)
        .join(broadcast(Tables.supplier(spark, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    }

    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm all four shapes
    time(g09(true)); time(g09(false)); time(q86(true)); time(q86(false))
    val rows = (1 to reps).map { r =>
      val ga = time(g09(true)); val gb = time(g09(false))
      val qa = time(q86(true)); val qb = time(q86(false))
      println(f"[ab] rep $r: g09 ckpt $ga%.3f nockpt $gb%.3f | q86 twolevel $qa%.3f cdist $qb%.3f")
      (ga, gb, qa, qb)
    }
    def mm(xs: Seq[Double], name: String): Unit =
      println(f"[ab] $name min ${xs.min}%.3f median ${xs.sorted.apply(xs.size / 2)}%.3f")
    mm(rows.map(_._1), "g09 ckpt   ")
    mm(rows.map(_._2), "g09 nockpt ")
    mm(rows.map(_._3), "q86 2level ")
    mm(rows.map(_._4), "q86 cdist  ")
    spark.stop()
  }
}
