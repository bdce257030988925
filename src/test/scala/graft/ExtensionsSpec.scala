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

  test("ThresholdedLevenshtein rewrites bounded comparisons to the banded DP") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    // Parquet-backed (LocalRelation would constant-fold first). A naive
    // user predicate `levenshtein(text, probe) <= 6` must leave the
    // optimizer as the O(k·n) banded form `levenshtein(text, probe, 6)`.
    val docs = Tables.documents(spark, TestSpark.sf).limit(200)
    val probe = "key agg row scan slow fast"
    def levOf(df: org.apache.spark.sql.DataFrame): Seq[Levenshtein] =
      df.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case l: Levenshtein => l })
    val filtered = docs.filter(expr(s"levenshtein(substring(text, 1, 26), '$probe') <= 6"))
    val levs = levOf(filtered)
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
      s"expected banded levenshtein, got: ${levs.mkString(";")}")
    // Semantics: membership equals a local reference DP on every doc.
    def localLev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = docs.select(col("doc_id"), substring(col("text"), 1, 26).as("h"))
      .collect().filter(r => localLev(r.getString(1), probe) <= 6).map(_.getLong(0)).toSet
    val got = filtered.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == expected, s"rewrite changed semantics: got ${got.size}, expected ${expected.size}")
    // Strict `<` lowers the band by one; flipped orientation matches too.
    val strict = levOf(docs.filter(expr(s"6 > levenshtein(text, '$probe')")))
    assert(strict.nonEmpty && strict.forall(
      _.threshold.exists(_.toString.contains("5"))), strict.mkString(";"))
    // Non-literal bounds stay untouched.
    val dynamic = levOf(docs.filter(expr("levenshtein(text, 'x') <= n_chars")))
    assert(dynamic.nonEmpty && dynamic.forall(_.threshold.isEmpty))
    // A BIGINT bound coerces the distance through Cast(…, LongType) —
    // the rule must see through the widening and still band (and the
    // rewrite must drop the now-redundant cast, not orphan it).
    val longBound = docs.filter(expr(s"levenshtein(text, '$probe') <= 6222111000"))
    assert(levOf(longBound).forall(_.threshold.isEmpty),
      "out-of-Int-range Long bound must stay untouched")
    val coerced = docs.filter(expr(s"levenshtein(substring(text, 1, 26), '$probe') <= CAST(6 AS BIGINT)"))
    val clevs = levOf(coerced)
    assert(clevs.nonEmpty && clevs.forall(_.threshold.isDefined),
      s"expected banded levenshtein through Cast, got: ${clevs.mkString(";")}")
    val gotCoerced = coerced.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(gotCoerced == expected, "Cast-path rewrite changed semantics")
  }
}
