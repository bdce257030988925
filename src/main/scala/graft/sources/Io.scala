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

  /** An append is MAINTENANCE of a standing table, never its creation
    * (that is [[writeBucketedBy]]'s job) — but `SaveMode.Append` +
    * `saveAsTable` happily CREATEs a missing table. After a compaction
    * crash in the DROP→RENAME window the standing table has no catalog
    * entry, and an append that silently recreates it with only the
    * delta rows turns a recoverable torn swap into silent data loss:
    * the next [[finishTornCompaction]] sees shadow + live "original"
    * and drops the shadow holding the entire standing corpus (r13
    * advice). Fail loud instead — the caller recovers the swap first. */
  private def requireStanding(spark: SparkSession, table: String): Unit =
    require(spark.catalog.tableExists(table),
      s"append to '$table': table does not exist — appends never create " +
        "(a missing standing table usually means a torn compaction swap; " +
        "run Io.finishTornCompaction first, then retry)")

  /** Append a batch to a standing bucketed table — the incremental-
    * maintenance write: new bucket files land beside the old ones (per
    * bucket id), standing files are never rewritten, and a reader's
    * bucket pruning / exchange elision sees old + new files of each
    * bucket alike. Spark validates the (keys, buckets) spec against the
    * catalog entry, so a mismatched append fails loud instead of
    * silently corrupting the layout; a MISSING table also fails loud
    * (see [[requireStanding]]) instead of being silently created with
    * only the batch's rows. */
  def appendBucketedBy(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    requireStanding(df.sparkSession, table)
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)
  }

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
      partitionCols: Seq[String], bucketKeys: Seq[String], buckets: Int): Unit = {
    requireStanding(df.sparkSession, table)
    df.write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
      .format("parquet").saveAsTable(table)
  }

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

  // ---- standing bucketed-layout compaction (r13) ------------------------
  //
  // [[appendBucketedBy]]/[[appendPartitionedBucketed]] are the
  // incremental-maintenance WRITES; this is the maintenance half they
  // make necessary: every fold/append lands new files BESIDE the standing
  // ones (per bucket id, per partition dir), so at production cadence the
  // hot read path accumulates small files without bound — listing cost,
  // task-scheduling overhead, and row-group fragmentation degrade the
  // probe long before 100 TB. Compaction rewrites the layout to
  // size-bounded files while preserving the THREE properties the layout
  // exists for: the catalog bucket spec (exchange elision), the
  // partition directories (pruning), and row content (byte-identical
  // probe results). AnnIndexSpec asserts all three post-compaction.
  //
  // Crash-safety contract (same single-maintainer model as the fold
  // itself — one maintenance job at a time, crash recovery supported):
  //   - partitioned tables compact per-partition via DYNAMIC partition
  //     overwrite: output is fully staged under `.spark-staging-*`
  //     before commit, and a crash BEFORE commit leaves every standing
  //     directory untouched. The commit itself is NOT atomic per
  //     partition — commitJob deletes each target directory then
  //     renames the staged one in, so a driver death inside that window
  //     can leave a partition's rows only under the abandoned staging
  //     dir (r13 advice). [[compactPartitionedBucketedTable]] therefore
  //     refuses to run while a leftover `.spark-staging-*` dir exists
  //     under the table root: the staged files are the rewritten rows
  //     of the hot partitions, so recovery is mechanical (move each
  //     staged `pc=` dir into place, or restore from the standing table
  //     if its directory survived) but deliberately manual — compacting
  //     over the evidence would make the loss permanent;
  //   - unpartitioned tables compact via a __compact shadow table +
  //     catalog rename; [[finishTornCompaction]] rolls an interrupted
  //     swap forward (orig dropped → rename shadow in) or back (both
  //     present → drop shadow) and is called automatically on entry.

  private def tableMeta(spark: SparkSession, table: String) =
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))

  /** (data file count, data bytes) under `dir`, recursively — `part-*`
    * files only, so commit markers and staging dirs never count. */
  private def dataFileStats(spark: SparkSession,
      dir: org.apache.hadoop.fs.Path): (Int, Long) = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return (0, 0L)
    val it = fs.listFiles(dir, true)
    var n = 0; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.startsWith("part-")) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }

  /** Data-file count of a catalog table's location (spec/test surface). */
  def tableFileCount(spark: SparkSession, table: String): Int =
    dataFileStats(spark,
      new org.apache.hadoop.fs.Path(tableMeta(spark, table).location))._1

  /** Recover an interrupted [[compactBucketedTable]] swap: the shadow
    * table is complete before the swap starts, so an orphaned shadow
    * with the original gone rolls FORWARD (rename in), a shadow beside
    * a live original rolls BACK (drop shadow — the next compaction just
    * re-runs), and a shadow DIRECTORY with no catalog entry (a crash
    * inside saveAsTable) is deleted so the rewrite can start clean. */
  def finishTornCompaction(spark: SparkSession, table: String): Unit = {
    val shadow = s"${table}__compact"
    val hasShadow = spark.catalog.tableExists(shadow)
    val hasOrig = spark.catalog.tableExists(table)
    if (hasShadow && !hasOrig)
      spark.sql(s"ALTER TABLE `$shadow` RENAME TO `$table`")
    else if (hasShadow && hasOrig)
      spark.sql(s"DROP TABLE `$shadow`")
    else if (!hasShadow) {
      // no catalog entry — clear any orphaned directory from a crash
      // inside the shadow write itself (job output is not yet a table).
      val dir = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(shadow)))
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(dir)) fs.delete(dir, true)
    }
  }

  /** Compact an UNPARTITIONED bucketed table in place when its file
    * count exceeds `maxFilesPerBucket` per bucket. The rewrite reads the
    * standing table once, coalesces to ceil(bytes / targetFileBytes)
    * tasks (NO exchange — compaction is an I/O rewrite, not a shuffle),
    * and writes a shadow table under the SAME bucket spec read from the
    * catalog, then swaps it in by rename. Each write task emits one file
    * per bucket id it holds, so the result is ≤ tasks × buckets files —
    * at the one-task floor, exactly `buckets` files, the layout minimum.
    * Returns (filesBefore, filesAfter), or None when under threshold. */
  def compactBucketedTable(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L << 20,
      maxFilesPerBucket: Int = 2): Option[(Int, Int)] = {
    finishTornCompaction(spark, table)
    val meta = tableMeta(spark, table)
    val spec = meta.bucketSpec.getOrElse(sys.error(
      s"compactBucketedTable($table): not a bucketed table"))
    val (files, bytes) =
      dataFileStats(spark, new org.apache.hadoop.fs.Path(meta.location))
    if (files <= maxFilesPerBucket * spec.numBuckets) return None
    val shadow = s"${table}__compact"
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val keys = spec.bucketColumnNames
    val w = spark.table(table).coalesce(n).write
      .bucketBy(spec.numBuckets, keys.head, keys.tail: _*)
    val ws = if (spec.sortColumnNames.nonEmpty)
      w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*) else w
    ws.format("parquet").saveAsTable(shadow)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$shadow` RENAME TO `$table`")
    Some((files, tableFileCount(spark, table)))
  }

  /** Compact a PARTITIONED + bucketed table, partition-selectively: only
    * directories whose file count crossed `maxFilesPerBucket` per bucket
    * are rewritten (the fold appends concentrate there; cold partitions
    * are never touched — at 100 TB this is the difference between a
    * bounded maintenance pass and a full-table rewrite). The rewrite is
    * one dynamic-partition-overwrite insert of exactly the hot
    * partitions' rows, coalesced to ceil(hotBytes / targetFileBytes)
    * tasks; the bucket spec comes from the catalog (insertInto writes
    * under the table's own spec — probed empirically: bucket-id file
    * naming, pruning, and exchange elision all survive the rewrite).
    * Crash-safety: staged-then-swapped per directory, but the swap
    * window is not atomic — see the contract block above; a leftover
    * `.spark-staging-*` dir under the root fails the call loud.
    * Returns (filesBefore, filesAfter) over the hot partitions, or None
    * when every partition is under threshold. */
  def compactPartitionedBucketedTable(spark: SparkSession, table: String,
      targetFileBytes: Long = 128L << 20,
      maxFilesPerBucket: Int = 2): Option[(Int, Int)] = {
    val meta = tableMeta(spark, table)
    val spec = meta.bucketSpec.getOrElse(sys.error(
      s"compactPartitionedBucketedTable($table): not a bucketed table"))
    val partCols = meta.partitionColumnNames
    require(partCols.size == 1,
      s"compactPartitionedBucketedTable($table): exactly one partition " +
        s"column supported, got $partCols")
    val root = new org.apache.hadoop.fs.Path(meta.location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".spark-staging"))
    require(stale.isEmpty,
      s"compactPartitionedBucketedTable($table): leftover staging dir(s) " +
        s"${stale.map(_.getPath.getName).mkString(", ")} under the table " +
        "root — a prior dynamic-partition-overwrite died inside its " +
        "commit window. Recover first (move staged `pc=` dirs into place, " +
        "or verify every standing partition directory survived and delete " +
        "the staging dir); compacting over it would orphan those rows " +
        "permanently.")
    val pc = partCols.head
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
    val hot = dirs.map { d =>
      val (n, bytes) = dataFileStats(spark, d.getPath)
      (d.getPath.getName.stripPrefix(s"$pc="), n, bytes)
    }.filter(_._2 > maxFilesPerBucket * spec.numBuckets)
    if (hot.isEmpty) return None
    val filesBefore = hot.map(_._2).sum
    val n = math.max(1,
      math.ceil(hot.map(_._3).sum.toDouble / targetFileBytes).toInt)
    // Hive-style dir names are URL-escaped; our layouts use primitive
    // partition values (pb ints), where name == value string and the
    // isin comparison casts to the column type.
    val hotVals = hot.map(_._1)
    // Session-level, not a writer option: the analyzer's self-overwrite
    // check (verifyNotReadPath) consults the SESSION conf — with static
    // overwrite a table can't be rewritten from its own rows at all;
    // dynamic mode stages output and swaps per-directory at commit,
    // which is exactly the crash-safety contract documented above.
    val pomKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(pomKey)
    spark.conf.set(pomKey, "dynamic")
    try {
      spark.table(table).filter(col(pc).isin(hotVals: _*))
        .coalesce(n)
        .write.mode(SaveMode.Overwrite)
        .insertInto(table)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(pomKey, v)
        case None => spark.conf.unset(pomKey)
      }
    }
    val filesAfter = hot.map(h => dataFileStats(spark,
      new org.apache.hadoop.fs.Path(root, s"$pc=${h._1}"))._1).sum
    Some((filesBefore, filesAfter))
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
