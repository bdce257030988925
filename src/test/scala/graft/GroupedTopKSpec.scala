package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.GroupedTopKApi

class GroupedTopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def input = Tables.orders(spark, TestSpark.sf)
    .join(Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
    .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))

  test("GroupedTopKExec is planned and matches the window-function answer") {
    val topk = GroupedTopKApi.topKPerGroup(input,
      Seq("c_mktsegment"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 3)
    assert(topk.queryExecution.executedPlan.treeString.contains("GroupedTopK "))
    val viaWindow = input
      .withColumn("rn", row_number().over(Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3).drop("rn")
    val got = topk.collect().map(_.toSeq).toSet
    val exp = viaWindow.collect().map(_.toSeq).toSet
    assert(got == exp, s"got=${got.size} exp=${exp.size}")
  }

  test("degenerate all-distinct group keys: bounded by the partition, correct output") {
    // Worst case for the heap map: every row its own group, so the
    // partial phase retains (a copy of) every row of its partition —
    // memory is min(partition rows, groups·k) copies, never MORE than
    // the partition it was handed (where the window form additionally
    // sorts). 500k distinct keys through a 4-thread session must
    // complete and return every row exactly once.
    val n = 500000L
    val df = spark.range(n).select(col("id"),
      (col("id") * 2654435761L % 1000003L).as("score"))
    val topk = GroupedTopKApi.topKPerGroup(df, Seq("id"), Seq("score" -> true), 3)
    assert(topk.count() == n)
    // Mixed case on the same input: 101 groups of ~5k rows each still
    // returns groups·k and matches the aggregate truth for k=1.
    val grouped = df.withColumn("g", col("id") % 101)
    val top1 = GroupedTopKApi.topKPerGroup(grouped, Seq("g"),
      Seq("score" -> true, "id" -> false), 1)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    val exp = grouped.groupBy(col("g")).agg(max(col("score")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1 == exp)
  }

  test("k larger than any group returns whole groups; k=1 returns maxima") {
    val all = GroupedTopKApi.topKPerGroup(input, Seq("c_mktsegment"),
      Seq("o_orderkey" -> false), 1000000)
    assert(all.count() == input.count())
    val top1 = GroupedTopKApi.topKPerGroup(input, Seq("c_mktsegment"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exp = input.groupBy(col("c_mktsegment")).agg(max(col("o_totalprice")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(top1 == exp)
  }
}
