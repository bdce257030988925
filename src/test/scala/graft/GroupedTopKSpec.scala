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
