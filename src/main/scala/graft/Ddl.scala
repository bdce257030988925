package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's DDL surface (CREATE/DROP TABLE/INDEX/VIEW/DATABASE,
  * andb/sql/parser/lexer.py:13-17) mapped onto Spark's catalog.
  *
  * On Spark + parquet the catalog entry IS the table: registering a
  * parquet path as a view gives scans with pushdown and pruning; "CREATE
  * INDEX" has no direct analog because the columnar format already
  * carries min/max page stats — the honest mapping is sort-order layout
  * (Z-order/cluster-by at write time), which `indexHint` documents. */
object Ddl {

  /** CREATE TABLE t AS <parquet dir>/name.parquet. */
  def createTable(spark: SparkSession, name: String, sfDir: String): Unit =
    Tables.load(spark, sfDir, name).createOrReplaceTempView(name)

  /** CREATE VIEW v AS <df>. */
  def createView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** DROP TABLE/VIEW. */
  def drop(spark: SparkSession, name: String): Boolean =
    spark.catalog.dropTempView(name)

  /** CREATE INDEX analog: on immutable parquet the "index" is data
    * layout. Returns the writer-side recipe (sort columns) that makes the
    * reference's `CREATE INDEX idx ON t (c)` scans partition/row-group
    * prunable; a no-op on already-written test data. */
  def indexHint(cols: Seq[String]): String =
    s"write-time layout: df.sortWithinPartitions(${cols.mkString(", ")}) " +
      "(+ partitionBy / bucketBy for equality keys) — parquet min/max " +
      "page stats then prune scans the way a B+-tree index would"

  /** Register all testdata tables so `spark.sql` works by name. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach(createTable(spark, _, sfDir))
}
