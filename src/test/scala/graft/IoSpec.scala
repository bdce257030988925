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

  test("bucketed LSH band table self-joins with zero exchange") {
    // The at-scale claim behind d05/v03: write the band table bucketed
    // by (band, bv) once, and every band-bucket self-join or probe reads
    // pre-shuffled data — candidate generation with no exchange at all.
    import org.apache.spark.sql.graft.VectorExpressions.hyperplaneSig
    val bandBits = 3; val nBands = 21
    val banded = Tables.embeddings(spark, TestSpark.sf)
      .withColumn("sig", hyperplaneSig(col("embedding"), bandBits * nBands))
      .select(col("vec_id"),
        explode(graft.operators.Lsh.bandStructs(col("sig"), bandBits, nBands)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.bv").as("bv"))
    Io.writeBucketedBy(banded, "bands_bkt", Seq("band", "bv"), 4)
    val t = spark.table("bands_bkt")
    val j = t.as("x").hint("merge").join(t.as("y"), Seq("band", "bv"))
      .filter(col("x.vec_id") < col("y.vec_id"))
    val plan = j.queryExecution.executedPlan.treeString
    assert(!plan.contains("Exchange hashpartitioning(band"), plan.take(600))
    assert(j.count() > 0)
    spark.sql("DROP TABLE IF EXISTS bands_bkt")
  }

  test("partitioned+bucketed fact layout: pruning AND exchange-free join together") {
    // The canonical 100 TB arrangement: partition by the filter column,
    // bucket by the join key — one layout serves both access paths.
    spark.sql("DROP TABLE IF EXISTS events_pb")
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "events_pb")
    if (wh.exists())
      Files.walk(wh.toPath).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    val events = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    Io.writePartitionedBucketed(events, "events_pb",
      Seq("event_type"), Seq("user_id"), buckets = 4)
    // Deterministic probe set: an unordered distinct().limit(50) could
    // pick different users in the two independent executions below.
    val users = Tables.events(spark, TestSpark.sf)
      .select(col("user_id")).distinct().orderBy(col("user_id")).limit(50)
    val j = spark.table("events_pb")
      .filter(col("event_type") === "click")
      .hint("merge")
      .join(users.hint("shuffle_merge"), Seq("user_id"))
    val plan = j.queryExecution.executedPlan.treeString
    // Partition pruning from the filter reached the fact scan...
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan.take(500))
    // ...the scan is bucketed...
    assert(plan.contains("Bucketed: true"), plan.take(500))
    // ...and the FACT branch (join → bucketed scan) has no exchange: only
    // the small probe side may shuffle to meet the buckets. Walk the plan
    // lines from the join to the events_pb scan and reject any Exchange
    // in between.
    val lines = plan.linesIterator.toVector
    val scanIdx = lines.indexWhere(_.contains("events_pb["))
    val joinIdx = lines.lastIndexWhere(_.contains("SortMergeJoin"), scanIdx)
    assert(joinIdx >= 0 && scanIdx > joinIdx, plan.take(600))
    val factBranch = lines.slice(joinIdx + 1, scanIdx)
    assert(!factBranch.exists(_.contains("Exchange")),
      s"exchange on the bucketed fact side:\n${factBranch.mkString("\n")}")
    val expected = events.filter(col("event_type") === "click")
      .join(users, Seq("user_id")).count()
    assert(j.count() == expected)
    spark.sql("DROP TABLE IF EXISTS events_pb")
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

  test("orc roundtrip preserves values and pushes filters to the scan") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    Io.writeOrc(orders, s"$tmp/orders_orc")
    val back = Io.readOrc(spark, s"$tmp/orders_orc")
      .filter(col("o_totalprice") > 100000.0)
    assert(back.count() ==
      orders.filter(col("o_totalprice") > 100000.0).count())
    val plan = back.queryExecution.executedPlan.treeString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"),
      plan.take(500))
  }

  test("compaction merges small files without losing rows") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // Simulate a streaming sink's droppings: 40 tiny files.
    orders.repartition(40).write.mode("overwrite").parquet(s"$tmp/orders_small")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$tmp/orders_small") == 40)
    // Target well above the total size ⇒ everything fits in one file.
    val n = Io.compact(spark, s"$tmp/orders_small", s"$tmp/orders_compact",
      targetFileBytes = 1L << 30)
    assert(n == 1)
    assert(parquetFiles(s"$tmp/orders_compact") == 1)
    val back = Io.readParquet(spark, s"$tmp/orders_compact")
    assert(back.count() == orders.count())
    assert(back.agg(sum(col("o_orderkey"))).head().getLong(0) ==
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))
    // Shuffled variant: exactly-even output across ~4 files (target =
    // a quarter of the measured input bytes).
    val total = new java.io.File(s"$tmp/orders_small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n4 = Io.compact(spark, s"$tmp/orders_small", s"$tmp/orders_compact4",
      targetFileBytes = math.max(1L, total / 4), shuffle = true)
    assert(n4 >= 4 && n4 <= 6, s"n4=$n4")
    assert(parquetFiles(s"$tmp/orders_compact4") == n4)
  }

  test("z-order layout prunes on BOTH columns where a single-key sort serves one") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val files = 16
    Io.writeZOrdered(orders, s"$tmp/orders_z", "o_custkey", "o_totalprice", files)
    // The single-key clustered layout every warehouse writes by default.
    orders.repartitionByRange(files, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(s"$tmp/orders_lin")
    // Per-file min/max of the SECOND column — exactly the stats parquet
    // row-group/file skipping consults for a predicate on o_totalprice.
    def fileRanges(p: String): Seq[(Double, Double)] =
      Io.readParquet(spark, p)
        .groupBy(input_file_name())
        .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    val (zr, lr) = (fileRanges(s"$tmp/orders_z"), fileRanges(s"$tmp/orders_lin"))
    assert(zr.size == files && lr.size == files)
    // A narrow predicate on o_totalprice: which files could contain it?
    val all = orders.agg(min(col("o_totalprice")), max(col("o_totalprice"))).head()
    val (gLo, gHi) = (all.getDouble(0), all.getDouble(1))
    val probeLo = gLo + (gHi - gLo) * 0.40
    val probeHi = gLo + (gHi - gLo) * 0.45
    def overlapping(rs: Seq[(Double, Double)]) =
      rs.count { case (lo, hi) => hi >= probeLo && lo <= probeHi }
    val (zHit, lHit) = (overlapping(zr), overlapping(lr))
    // Sorted-by-custkey files each span ~the whole price range: no skip.
    // Z-ordered files cover price rectangles: most files are skippable.
    assert(lHit == files, s"linear layout unexpectedly selective: $lHit/$files")
    assert(zHit <= files / 2, s"z-order not selective on 2nd column: $zHit/$files")
  }

  test("binaryFile source ingests raw files with extension pruning at listing") {
    val dir = Files.createTempDirectory("graft-bin")
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    Files.write(dir.resolve("red.png"), png(16, 8, 0xFF0000))
    Files.write(dir.resolve("green.png"), png(10, 10, 0x00FF00))
    Files.write(dir.resolve("notes.txt"), "not an image".getBytes)
    val files = Io.readBinaryFiles(spark, dir.toString, glob = "*.png")
    // The .txt never enters the scan — pruned at listing, not filtered.
    assert(files.count() == 2)
    val feats = graft.operators.Multimodal
      .extractFeatures(graft.operators.Multimodal.fromBinaryFiles(files))
      .collect().map(f => f.format -> f.features).toMap
    assert(feats.keySet == Set("png"))
    // Real decode, not the stub: dims ride in features(5)/(6), channel
    // means in features(0..2).
    val byDims = graft.operators.Multimodal
      .extractFeatures(graft.operators.Multimodal.fromBinaryFiles(files))
      .collect().map(f => (f.features(5).toInt, f.features(6).toInt) -> f.features).toMap
    assert(byDims.keySet == Set((16, 8), (10, 10)))
    assert(math.abs(byDims((16, 8))(0) - 1.0f) < 1e-3) // red channel mean
    assert(math.abs(byDims((10, 10))(1) - 1.0f) < 1e-3) // green channel mean
  }

  test("schema evolution: old files null-fill new columns under both read forms") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evo").toString
    // Month 1: (doc_id, text). Month 2 adds a quality column.
    Seq((1L, "old doc")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "new doc", 0.9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    // Exploration form: footer-merged union schema.
    val merged = Io.readParquetMerged(spark, dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality"))
    val rows = merged.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (if (r.isNullAt(r.fieldIndex("quality"))) None
         else Some(r.getAs[Double]("quality")))).toMap
    assert(rows == Map(1L -> None, 2L -> Some(0.9)))
    // Production form: pinned superset schema — same semantics, no
    // footer sweep, and a plain read (which would pick ONE footer and
    // either miss the column or fail) is avoided.
    val pinned = Io.readParquetAs(spark, dir,
      "doc_id BIGINT, text STRING, quality DOUBLE")
    assert(pinned.columns.toSet == Set("doc_id", "text", "quality"))
    assert(pinned.filter($"doc_id" === 1L && $"quality".isNull).count() == 1)
    assert(pinned.filter($"doc_id" === 2L && $"quality" === 0.9).count() == 1)
  }

  test("bucketed appends refuse to create a missing table") {
    // SaveMode.Append + saveAsTable silently CREATEs a missing table —
    // which turns a torn compaction swap into silent data loss (the
    // recreated delta-only table reads as the "original" and the next
    // rollback drops the shadow holding the standing corpus). Appends
    // are maintenance, never creation: both layout append paths must
    // fail loud on a missing table.
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    spark.sql("DROP TABLE IF EXISTS io_no_create")
    val e1 = intercept[IllegalArgumentException] {
      Io.appendBucketedBy(df, "io_no_create", Seq("k"), 2)
    }
    assert(e1.getMessage.contains("finishTornCompaction"))
    val dfp = Seq((1L, 0, "a")).toDF("k", "p", "v")
    val e2 = intercept[IllegalArgumentException] {
      Io.appendPartitionedBucketed(dfp, "io_no_create", Seq("p"), Seq("k"), 2)
    }
    assert(e2.getMessage.contains("finishTornCompaction"))
    assert(!spark.catalog.tableExists("io_no_create"))
  }

  test("partitioned compaction refuses to run over a leftover staging dir") {
    // Dynamic-partition overwrite's commit window is not atomic: a
    // driver death between a target dir's delete and the staged dir's
    // rename leaves that partition's rows ONLY under .spark-staging-*.
    // Compacting over that state would orphan the rows permanently, so
    // the pass must fail loud and point at the evidence.
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS io_staging_guard")
    Io.writePartitionedBucketed(
      Seq((1L, 0, "a"), (2L, 1, "b")).toDF("k", "p", "v"),
      "io_staging_guard", Seq("p"), Seq("k"), 2)
    val root = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("io_staging_guard")).location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(root, ".spark-staging-deadbeef")
    fs.mkdirs(stale)
    try {
      val e = intercept[IllegalArgumentException] {
        Io.compactPartitionedBucketedTable(spark, "io_staging_guard",
          maxFilesPerBucket = 0)
      }
      assert(e.getMessage.contains(".spark-staging-deadbeef"))
      // Clearing the evidence unblocks the pass.
      fs.delete(stale, true)
      assert(Io.compactPartitionedBucketedTable(spark, "io_staging_guard",
        maxFilesPerBucket = 0).nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS io_staging_guard")
    }
  }
}
