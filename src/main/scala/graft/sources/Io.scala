package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

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

  /** Append a batch to a standing bucketed table — the incremental-
    * maintenance write: new bucket files land beside the old ones (per
    * bucket id), standing files are never rewritten, and a reader's
    * bucket pruning / exchange elision sees old + new files of each
    * bucket alike. Spark validates the (keys, buckets) spec against the
    * catalog entry, so a mismatched append fails loud instead of
    * silently corrupting the layout. */
  def appendBucketedBy(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
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

  /** [[appendBucketedBy]] for the partitioned+bucketed layout: new files
    * land inside the matching partition directories, per bucket id —
    * standing files untouched, pruning and exchange elision unchanged
    * (Spark validates the partition/bucket spec against the catalog). */
  def appendPartitionedBucketed(df: DataFrame, table: String,
      partitionCols: Seq[String], bucketKeys: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
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

  /** Raw-file ingest for the multimodal pipeline: Spark's `binaryFile`
    * source reads whole files as rows of (path, modificationTime, length,
    * content BINARY) — the standard way image/audio/video corpora enter a
    * lakehouse before being repacked into parquet binary columns
    * (Multimodal.fromBinaryFiles does the repack). `pathGlobFilter` prunes
    * by extension at LISTING time, so non-matching files are never opened;
    * at 100 TB ingest the listing itself is distributed by Spark's
    * InMemoryFileIndex. Files above `spark.sql.sources.binaryFile.maxLength`
    * fail fast rather than OOM a task — lower it deliberately when a
    * corpus may contain outlier blobs. */
  def readBinaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Schema-evolution read: a corpus written over months gains columns
    * (new quality signals, new metadata) without rewriting old files.
    * `mergeSchema` unions the footer schemas across all files — old
    * files surface the new columns as NULL, new files keep them — at
    * the cost of reading every file footer at planning time, so at
    * 100 TB prefer declaring the SUPERSET schema explicitly (the
    * `schemaDdl` overload below: no footer sweep, same null-fill
    * semantics) and reserve mergeSchema for exploration. */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Production form of schema evolution: pin the superset schema —
    * planning cost is O(1) in file count and column types are enforced
    * rather than inferred from whichever footers happen to exist. */
  def readParquetAs(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).parquet(path)

  // ---- layout maintenance ----------------------------------------------

  /** Small-file compaction — the housekeeping pass every streaming/
    * incremental sink needs: K tiny files become ceil(bytes/target) right-
    * sized ones. `shuffle = false` (default) uses coalesce — NO exchange,
    * adjacent input splits merge in place, the cheap path when input
    * sizes are roughly even; `shuffle = true` pays one round-robin
    * exchange for exactly-even output files (skewed inputs). Writes to a
    * fresh directory and never mutates the source — swap is the caller's
    * atomic rename. Returns the target file count. */
  def compact(spark: SparkSession, srcPath: String, destPath: String,
      targetFileBytes: Long = 128L << 20, shuffle: Boolean = false): Int = {
    val p = new org.apache.hadoop.fs.Path(srcPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(srcPath)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode(SaveMode.Overwrite).parquet(destPath)
    n
  }

  /** Morton (Z-order) interleave of two ≤`bits`-bit non-negative longs:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Bits never
    * overlap, so the additive reduce IS the bitwise OR, and the whole
    * expression stays inside whole-stage codegen. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order-clustered parquet: rows are range-partitioned and sorted by
    * the Morton interleave of the two columns' min-max-scaled ranks, so
    * every output file covers a small RECTANGLE in (a, b) space instead of
    * a thin stripe. Result: parquet min/max stats (and any file-level
    * pruning) are selective on EITHER column — the multi-dimensional
    * clustered-index analog of the reference's secondary B+-tree indexes
    * (andb/storage/engines/heap/relation.py), where a single-key sort
    * only ever serves one of them. The scaling stats ride a broadcast
    * 1-row aggregate — no collect, no extra pass over the data beyond the
    * one aggregate. IoSpec asserts the pruning property from the written
    * files' own stats. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 12): Unit = {
    val stats = df.agg(
      min(col(colA)).cast("double").as("__mina"), max(col(colA)).cast("double").as("__maxa"),
      min(col(colB)).cast("double").as("__minb"), max(col(colB)).cast("double").as("__maxb"))
    def scaled(c: Column, lo: Column, hi: Column): Column =
      least(lit((1L << bits) - 1), floor(
        (c.cast("double") - lo) / (hi - lo + lit(1e-12)) * lit(1L << bits))).cast("long")
    df.crossJoin(broadcast(stats))
      .withColumn("__z", interleaveBits(
        scaled(col(colA), col("__mina"), col("__maxa")),
        scaled(col(colB), col("__minb"), col("__maxb")), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__mina", "__maxa", "__minb", "__maxb")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
