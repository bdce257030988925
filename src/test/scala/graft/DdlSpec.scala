package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDL surface: ALTER analogs are catalog-only projection changes over
  * the same parquet scan; ANALYZE feeds Spark's cost model real stats. */
class DdlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("alter rename/add/drop column re-register the same scan") {
    Ddl.createTable(spark, "nation", TestSpark.sf)
    val renamed = Ddl.alterRenameColumn(spark, "nation", "n_name", "nation_name")
    assert(renamed.columns.contains("nation_name") && !renamed.columns.contains("n_name"))
    // The view under the original name reflects the rename.
    assert(spark.table("nation").columns.contains("nation_name"))

    val added = Ddl.alterAddColumn(spark, "nation", "key_sq",
      col("n_nationkey") * col("n_nationkey"))
    assert(added.columns.contains("key_sq"))
    val r = spark.sql("SELECT key_sq FROM nation WHERE n_nationkey = 3").collect().head
    assert(r.getAs[Number](0).longValue == 9L)

    val dropped = Ddl.alterDropColumn(spark, "nation", "key_sq")
    assert(!dropped.columns.contains("key_sq"))
    // Restore the canonical registration for other specs.
    Ddl.createTable(spark, "nation", TestSpark.sf)
  }

  test("create/use/drop database scope unqualified table names") {
    Ddl.dropDatabase(spark, "graft_db")
    Ddl.createDatabase(spark, "graft_db")
    val prev = Ddl.currentDatabase(spark)
    try {
      Ddl.useDatabase(spark, "graft_db")
      assert(Ddl.currentDatabase(spark) == "graft_db")
      // A table created while USE graft_db is active lands in — and
      // resolves unqualified from — that namespace.
      spark.sql(s"CREATE TABLE marker USING parquet LOCATION '${TestSpark.sf}/nation.parquet'")
      assert(spark.table("marker").count() == 25)
      assert(spark.table("graft_db.marker").count() == 25)
      Ddl.useDatabase(spark, prev)
      // Unqualified resolution no longer sees it; qualified still does.
      assert(intercept[Exception](spark.table("marker").collect()) != null)
      assert(spark.table("graft_db.marker").count() == 25)
    } finally {
      Ddl.useDatabase(spark, prev)
      Ddl.dropDatabase(spark, "graft_db")
      assert(!spark.catalog.databaseExists("graft_db"))
    }
  }

  test("hostile database names cannot break out of the DDL statement") {
    // A raw splice of this name would parse as TWO statements (or a
    // CASCADE drop of the wrong database); the quoted form treats the
    // whole string as one identifier, so it either round-trips as a
    // literal name or is rejected by the catalog's name validation —
    // never executed as SQL. The sibling database must survive.
    Ddl.dropDatabase(spark, "graft_sibling")
    Ddl.createDatabase(spark, "graft_sibling")
    val hostile = "x` CASCADE; DROP DATABASE graft_sibling; --"
    try {
      try {
        Ddl.createDatabase(spark, hostile)
        Ddl.dropDatabase(spark, hostile)
      } catch {
        case e: Exception => // catalog-level invalid-name rejection is fine
          assert(!e.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
            e.getMessage.contains("`"), s"broke out of the statement: ${e.getMessage}")
      }
      assert(spark.catalog.databaseExists("graft_sibling"),
        "hostile name executed a DROP on a different database")
    } finally Ddl.dropDatabase(spark, "graft_sibling")
  }

  test("plan cache returns the identical plan object on repeat statements") {
    Ddl.createTable(spark, "nation", TestSpark.sf)
    val pc = new PlanCache(maxEntries = 2)
    val text = "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey"
    val first = pc.sql(spark, text)
    val second = pc.sql(spark, text)
    // Same object ⇒ parse/analyze/optimize ran once for the two calls.
    assert(first eq second)
    assert(pc.hits == 1 && pc.misses == 1)
    assert(second.collect().length == 5)
    // LRU bound: two more distinct texts evict the eldest.
    pc.sql(spark, "SELECT 1 AS a")
    pc.sql(spark, "SELECT 2 AS a")
    assert(pc.size == 2)
    assert(!(pc.sql(spark, text) eq first), "evicted entry must rebuild")
  }

  test("analyzeTable computes real row counts for the cost model") {
    val (size, rowCount) = Ddl.analyzeTable(spark, "nation", TestSpark.sf,
      cols = Seq("n_nationkey", "n_regionkey"))
    assert(size > 0)
    val expected = Tables.nation(spark, TestSpark.sf).count()
    assert(rowCount.contains(BigInt(expected)), s"rowCount=$rowCount expected=$expected")
    spark.sql("DROP TABLE IF EXISTS nation_analyzed")
  }

  test("checkpoint materializes and truncates lineage") {
    val df = Tables.nation(spark, TestSpark.sf).filter(col("n_regionkey") === 1)
    val cp = Ddl.checkpoint(df)
    assert(cp.count() == df.count())
    // The checkpointed plan no longer derives from the parquet scan.
    assert(cp.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      cp.queryExecution.optimizedPlan.toString)
  }

  test("analyzed stats reach the optimizer's plan estimates under CBO") {
    Ddl.analyzeTable(spark, "nation", TestSpark.sf)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // With CBO on, the logical plan's cardinality estimate is the
      // ANALYZE row count — the input join reorder and broadcast
      // decisions key off — not a file-size guess.
      val stats = spark.table("nation_analyzed").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"stats=$stats")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS nation_analyzed")
    }
  }
}
