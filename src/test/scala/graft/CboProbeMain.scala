package graft

/** One-off probe: what does CBO join reorder actually do to a badly
  * ordered q24 twin with ANALYZE stats present? (Not part of the suite —
  * run with Test/runMain graft.CboProbeMain.) */
object CboProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    for (t <- Seq("customer", "orders", "lineitem", "nation", "region")) {
      graft.Ddl.analyzeTable(spark, t, sf,
        cols = Seq.empty)
    }
    spark.sql("ANALYZE TABLE customer_analyzed COMPUTE STATISTICS FOR COLUMNS c_custkey, c_nationkey")
    spark.sql("ANALYZE TABLE orders_analyzed COMPUTE STATISTICS FOR COLUMNS o_custkey, o_orderkey, o_orderdate")
    spark.sql("ANALYZE TABLE lineitem_analyzed COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    spark.sql("ANALYZE TABLE nation_analyzed COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey, n_name")
    spark.sql("ANALYZE TABLE region_analyzed COMPUTE STATISTICS FOR COLUMNS r_regionkey, r_name")
    val bad = """
      SELECT n_name, count(*) AS cnt
      FROM lineitem_analyzed l
      JOIN region_analyzed r ON r.r_name = 'ASIA'
      JOIN nation_analyzed n ON n.n_regionkey = r.r_regionkey
      JOIN customer_analyzed c ON c.c_nationkey = n.n_nationkey
      JOIN orders_analyzed o ON o.o_custkey = c.c_custkey AND l.l_orderkey = o.o_orderkey
      GROUP BY n_name"""
    def planOf(cbo: Boolean): String = {
      val sess = spark.newSession()
      sess.conf.set("spark.sql.cbo.enabled", cbo.toString)
      sess.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
      sess.sql(bad).queryExecution.optimizedPlan.treeString
    }
    println("==== CBO OFF ====")
    println(planOf(false))
    println("==== CBO ON ====")
    println(planOf(true))
  }
}
