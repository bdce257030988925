package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface: how graft tables get on and off disk.
  *
  * The reference reads/writes its own heap pages + WAL
  * (andb/storage/engines/heap/relation.py); on Spark the durable layer is
  * columnar files + layout, and the "access methods" are:
  *
  *   - plain parquet        — columnar scan, pushdown, pruning (Tables)
  *   - partitioned parquet  — directory layout = coarse index: equality/
  *                            range filters on partition columns prune
  *                            whole directories before any I/O
  *   - bucketed tables      — pre-shuffled layout: a join/agg on the
  *                            bucket key needs NO exchange at read time;
  *                            at 100 TB this converts every recurring
  *                            fact-fact join on the same key from a
  *                            full-table shuffle into local merges
  *   - csv / json           — interchange formats for ingest/export
  *
  * All writers take explicit paths/tables and overwrite idempotently —
  * re-running a round never double-appends.
  */
object Io {

  // ---- sinks ----------------------------------------------------------

  /** Hive-style partitioned parquet: one directory per distinct value
    * tuple. Keep partition columns low-cardinality (date, type, lang). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table (requires a catalog table, not a bare path).
    * `buckets` should match the downstream join parallelism. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketedBy(df, table, Seq(key), buckets)

  /** Multi-key bucketing — e.g. an LSH band table bucketed by
    * (band, bucket-value) so band-bucket joins and probes read
    * pre-shuffled data. Join keys must cover the bucket keys exactly for
    * the exchange to be elided. */
  def writeBucketedBy(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** The canonical 100 TB fact-table layout: partitioned by the
    * low-cardinality filter columns AND bucketed by the recurring join
    * key — a probe prunes partitions first, then the join on the bucket
    * key needs no exchange. IoSpec proves both properties together. */
  def writePartitionedBucketed(df: DataFrame, table: String,
      partitionCols: Seq[String], bucketKeys: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .format("parquet").saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the other columnar interchange format (predicate pushdown and
    * column pruning apply the same as parquet). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  // ---- sources --------------------------------------------------------

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-explicit CSV read (inference costs a full extra pass at
    * scale; always pass the schema in production paths). */
  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)

  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
