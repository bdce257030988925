package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Io

class IoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val tmp = Files.createTempDirectory("graft-io").toString

  test("partitioned parquet write prunes partitions on read") {
    val events = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("event_type"), col("value"))
    Io.writePartitioned(events, s"$tmp/events_part", Seq("event_type"))
    val back = Io.readParquet(spark, s"$tmp/events_part")
      .filter(col("event_type") === "click")
    val expected = events.filter(col("event_type") === "click").count()
    assert(back.count() == expected)
    val plan = back.queryExecution.executedPlan.treeString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan.take(400))
  }

  test("bucketed table join runs without an exchange on the bucketed side") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    Io.writeBucketed(orders, "orders_bkt", "o_custkey", buckets = 4)
    val customers = Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = spark.table("orders_bkt")
      .hint("merge")
      .join(customers, col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.treeString
    // The bucketed side must NOT re-shuffle on the join key.
    val exchangesOnBucketSide = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning(o_custkey")).size
    assert(exchangesOnBucketSide == 0, plan.take(600))
    assert(joined.count() ==
      orders.join(customers, col("o_custkey") === col("c_custkey")).count())
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
  }

  test("csv and json roundtrip preserve values") {
    val nation = Tables.nation(spark, TestSpark.sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val schema = "n_nationkey INT, n_name STRING, n_regionkey INT"
    Io.writeCsv(nation, s"$tmp/nation_csv")
    Io.writeJson(nation, s"$tmp/nation_json")
    val csvBack = Io.readCsv(spark, s"$tmp/nation_csv", schema)
    val jsonBack = Io.readJson(spark, s"$tmp/nation_json", schema)
    val orig = nation.collect().map(_.toSeq).toSet
    assert(csvBack.collect().map(_.toSeq).toSet == orig)
    assert(jsonBack.collect().map(_.toSeq).toSet == orig)
  }
}
