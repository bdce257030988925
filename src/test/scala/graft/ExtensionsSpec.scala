package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("injected SQL functions resolve and compute") {
    val r = spark.sql(
      """SELECT graft_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                    CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c,
        |       graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d,
        |       graft_l2norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS n
        |""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-12)
  }

  test("NormalizeConstantCosine rewrites constant-vector cosine to the fused form") {
    // Parquet-backed (a LocalRelation input would be constant-folded away
    // before the rewrite could be observed).
    val e = Tables.embeddings(spark, TestSpark.sf)
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val viaCosine = e.select(col("vec_id"),
      org.apache.spark.sql.graft.VectorExpressions
        .cosine(col("embedding"), lit(qv)).as("c"))
    val optimized = viaCosine.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine_const"), optimized)
    assert(!optimized.contains("graft_cosine("), optimized)
    // Rewritten plan must still satisfy cosine(q, q) = 1.
    val top = viaCosine.filter(col("vec_id") === 0).collect().head.getDouble(1)
    assert(math.abs(top - 1.0) < 1e-12)
  }

  test("zero-vector semantics survive the rewrite") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "v")
      .select(org.apache.spark.sql.graft.VectorExpressions
        .cosine(col("v"), lit(Array(1.0f, 1.0f))).as("c"))
    assert(df.collect().head.getDouble(0) == 0.0)
    val dfZeroConst = Seq((1L, Array(1.0f, 1.0f))).toDF("id", "v")
      .select(org.apache.spark.sql.graft.VectorExpressions
        .cosine(col("v"), lit(Array(0.0f, 0.0f))).as("c"))
    assert(dfZeroConst.collect().head.getDouble(0) == 0.0)
  }

  test("length-mismatched cosine is null, on the rewrite path too") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
      .select(org.apache.spark.sql.graft.VectorExpressions
        .cosine(col("v"), lit(Array(1.0f, 1.0f))).as("c"))
    assert(df.collect().head.isNullAt(0))
    val equalLen = Seq((1L, Array(1.0f, 1.0f))).toDF("id", "v")
      .select(org.apache.spark.sql.graft.VectorExpressions
        .cosine(col("v"), lit(Array(1.0f, 1.0f))).as("c"))
    assert(math.abs(equalLen.collect().head.getDouble(0) - 1.0) < 1e-12)
  }
}
