package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class UtilitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin preserves inner equi-join semantics under skew") {
    // 10k rows, 90% on one hot key — the shape AQE alone can't always fix.
    val large = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (20L, "cold"), (30L, "cold")).toDF("k", "name")
    val expected = large.join(small, Seq("k"), "inner").count()
    val salted = Skew.saltedJoin(large, small, "k", buckets = 8)
    assert(salted.count() == expected)
    assert(salted.columns.toSeq == Seq("k", "payload", "name"))
  }

  test("saltedCount equals plain count by key") {
    val df = spark.range(5000)
      .select(when(col("id") % 100 =!= 0, lit("hot")).otherwise(lit("rare")).as("k"))
    val plain = df.groupBy(col("k")).count().as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(df, col("k"), buckets = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("q33 approximate aggregates stay within sketch error bounds") {
    val sf = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q33_approx_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (parts, median)) =>
      val (aParts, aMedian) = approx(k)
      assert(math.abs(aParts - parts).toDouble / parts < 0.05,
        s"$k distinct: approx=$aParts exact=$parts")
      assert(math.abs(aMedian - median) / median < 0.05,
        s"$k median: approx=$aMedian exact=$median")
    }
  }

  test("Explain surfaces plan lines as a DataFrame") {
    val lines = Explain.query(spark, "q25_tpch_q1", TestSpark.sf)
      .collect().map(_.getString(0))
    assert(lines.exists(_.contains("Scan parquet")))
    assert(lines.exists(_.contains("HashAggregate")))
  }

  test("Ddl registers tables for spark.sql and drops them") {
    Ddl.registerAll(spark, TestSpark.sf)
    val n = spark.sql(
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect().head.getLong(0)
    assert(n > 0)
    assert(Ddl.drop(spark, "lineitem"))
    assert(Ddl.indexHint(Seq("l_shipdate")).contains("sortWithinPartitions"))
  }
}
