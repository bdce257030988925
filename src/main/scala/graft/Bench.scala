package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 first runs every query so
  * the timed pass measures execution, not JVM JIT + codegen compilation
  * (both are per-plan-shape caches that a long-lived cluster app would
  * have warm). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions) // run under the library's own rules
      // Default = cpus (the gate table); SPARK_GRAFT_SHUFFLE_PARTITIONS
      // overrides for scale-attribution legs — "does a superlinear octave
      // row linearize when partitions scale with the corpus, the way a
      // real cluster would scale them?" (the ScaleSmokeMain experiment,
      // available on the bench surface since r11).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Split multi-file tables file-per-task instead of packing them
      // back into one split: the gate corpora are small enough that the
      // default 128 MB packing collapses a 32-file table into ONE scan
      // task, serializing every scan-bound per-row kernel (m04 measured
      // 19x instead of ~4x at sf1.0). The production analog is simply
      // "size maxPartitionBytes to the cluster", per SURVEY §5.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deterministic name-sorted order for BOTH the warm-up and the timed
    // pass: JIT/codegen warm-up and page-cache state then hit every query
    // identically run-to-run, so per-query numbers are comparable across
    // rounds (the r2 driver run had a 7.9x one-off on whichever query ran
    // cold first).
    // Optional subset (regex on query name) for controlled A/B runs —
    // e.g. SPARK_GRAFT_BENCH_FILTER='^(s0[1-9]|t0[1-9]|t1[0-6])' replays
    // exactly the block a drift was observed on.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.findFirstIn(n).isDefined) }
    val warmDir = "/root/testdata/sf0.001"
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // Three timed reps, report min: same query, same plan — min is the
    // machine-noise-robust steady-state capability (the first rep also
    // absorbs the cold file-cache read of the target SF).
    // SPARK_GRAFT_BENCH_REPS overrides for big-SF one-pass sweeps where
    // 3× the surface doesn't fit a session (the durable-minima protocol
    // then merges several single-rep runs instead).
    // Clamped to ≥1 and tolerant of junk: a mistyped value must degrade
    // to the default, not crash the whole sweep with an empty times seq.
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    // Matched-conditions legs (r11, verdict item 2): the r9/r10
    // adjudications kept finding per-query numbers moved 1.7–20× with
    // the BENCH CONTEXT — whichever query ran before the target leaves
    // its JIT/page-cache/GC state behind, so two legs are comparable
    // only if they share a predecessor or both run standalone
    // (BASELINE.md r10, "harness order is part of the measurement").
    // SPARK_GRAFT_BENCH_PRED=<query-name> pins that context: the named
    // query runs once, UNTIMED, at the target SF immediately before
    // every selected query's timed reps. Octave/regression rows in
    // BASELINE.md should come from either FILTER-standalone legs or
    // PRED-pinned legs — never from two different full-surface runs.
    val pred = sys.env.get("SPARK_GRAFT_BENCH_PRED").map { p =>
      SparkEntry.queries.getOrElse(p,
        throw new IllegalArgumentException(s"SPARK_GRAFT_BENCH_PRED=$p is not a query name"))
    }
    // Calibration probes (r12, verdict item 2): two fixed synthetic jobs —
    // one CPU/codegen-bound (wide range + arithmetic, no I/O), one
    // shuffle-bound (groupBy over a synthetic key) — run before and after
    // the timed pass and recorded in the JSON. Box-context drift between
    // rounds ("the box ran hot") then becomes a NUMBER: compare this
    // round's probe_pre/probe_post to last round's before reading any
    // total-to-total delta. Corpus-independent on purpose (spark.range, no
    // parquet) so the probe measures the BOX, not the dataset.
    // r14 (verdict item 3): a SINGLE probe point's leg-to-leg variance
    // (shuffle 0.32–0.46 across pinned r12/r13 legs) is wider than the
    // effects probe-normalization adjudicates, so one number per side
    // lets "raw 0.96x" and "norm 1.13x" both be quoted from one table.
    // Every individual probe time is therefore recorded: min-of-3 at
    // pre and post (unchanged semantics — comparable to r12/r13), plus
    // three single-shot samples interleaved at the 1/4, 1/2, 3/4 marks
    // of the timed pass = nine samples per side, landing in the JSON as
    // probe_samples plus a [min, median, max] probe_band. Downstream,
    // probe_compare turns the band into a normalized RANGE instead of a
    // point estimate.
    val probeScanSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val probeShufSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    def probeTime(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def scanJob(): Unit = spark.range(0L, 200000000L, 1L, 32)
      .selectExpr("sum(id * 2654435761L % 1000003)").collect()
    def shuffleJob(): Unit = spark.range(0L, 8000000L, 1L, 32)
      .selectExpr("id % 100000 as k").groupBy("k").count()
      .selectExpr("sum(count)").collect()
    def probeSample(): (Double, Double) = {
      val s = probeTime(scanJob()); val h = probeTime(shuffleJob())
      probeScanSamples += s; probeShufSamples += h
      (s, h)
    }
    def calibrationProbe(): (Double, Double) = {
      val ss = (1 to 3).map(_ => probeSample())
      (ss.map(_._1).min, ss.map(_._2).min)
    }
    scanJob(); shuffleJob() // warm the two plan shapes once, untimed
    val probePre = calibrationProbe()
    // Queries whose pinned predecessor THREW (r12 advice): stderr alone is
    // not loud enough — the stdout consumer captures only this process's
    // tail, so a leg that silently degraded to unpinned would post its
    // timings indistinguishably from a controlled one. The names land in
    // the JSON as "pred_failed" so every downstream table sees the
    // degradation next to the numbers it taints.
    val predFailed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Interleaved probe points: immediately before the queries at the
    // 1/4, 1/2, 3/4 marks of the (name-sorted, deterministic) timed
    // order. This inserts a tiny synthetic predecessor in front of
    // those three queries — a permanent structural change from r14 on;
    // full-surface runs remain comparable only to runs with the same
    // structure, which is already the standing rule.
    val n = ordered.size
    val interleaveAt: Set[Int] = Set(n / 4, n / 2, 3 * n / 4).filter(i => i > 0 && i < n)
    // Rows that tripped the >2× rep-spread guard, with ALL their raw rep
    // times (the flagged-row evidence verdict r14 item 3 asked for).
    val noisyReps = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val results = ordered.zipWithIndex.map { case ((name, fn), idx) =>
      if (interleaveAt(idx)) probeSample()
      pred.foreach { pf =>
        // A pred failure must be LOUD: if the pinned predecessor throws at
        // the target SF the leg silently degrades to unpinned, which is
        // exactly the uncontrolled comparison PRED exists to prevent.
        try pf(spark, sfDir).count() catch { case e: Throwable =>
          predFailed += name
          System.err.println(s"[bench] pred failed before $name: " +
            s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
        }
      }
      // A failed rep must NOT post its (near-zero) wall as the query's
      // min — the r11 sf4.0 leg showed a throwing query landing as
      // "0.006 s", which reads as FAST in every downstream table. Failed
      // reps are excluded; a query with zero successful reps posts -1.0
      // (impossible as a duration, loud in any consumer) and the error
      // goes to stderr.
      def timedRep(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: " +
            s"${String.valueOf(e.getMessage).take(300)}")
          None
        }
      }
      val base = (1 to reps).flatMap(_ => timedRep())
      // Per-query noise rejection (r15, verdict item 3): min-of-3 cannot
      // reject this box's single-row 4–12× spikes (r14 c32 leg: d03
      // 2.597 s vs 0.207 same-code c8; d01/d04/d08 same pattern). A row
      // whose rep spread exceeds 2× gets two EXTRA reps and reports the
      // min of all — the min is still the same statistic, computed on a
      // sample robust to one or two co-scheduled-box blowouts. Flagged
      // rows land in the JSON ("noisy_reps") with every raw rep time so
      // downstream tables can see exactly what was rejected. Only the
      // default multi-rep protocol opts in (REPS=1 big-SF sweeps keep
      // their one-pass semantics).
      val times =
        if (base.size >= 2 && reps >= 3 && base.max / base.min > 2.0)
          base ++ (1 to 2).flatMap(_ => timedRep())
        else base
      if (times.size > base.size) noisyReps(name) = times
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    // 3-decimal floats: the consumer captures only the TAIL of this
    // process's output, and the full-precision form of ~76 entries
    // overflowed that buffer (round-3 bench line arrived truncated →
    // unparseable). 1 ms resolution is below the box's noise floor anyway.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val probePost = calibrationProbe()
    def probeJson(p: (Double, Double)): String =
      s"""{"scan":${f3(p._1)},"shuffle":${f3(p._2)}}"""
    def band(xs: Seq[Double]): String = {
      val s = xs.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      s"[${f3(s.head)},${f3(med)},${f3(s.last)}]"
    }
    val probeBand =
      s""","probe_band":{"scan":${band(probeScanSamples.toSeq)},""" +
      s""""shuffle":${band(probeShufSamples.toSeq)}}"""
    val probeSamplesJson =
      s""","probe_samples":{"scan":${probeScanSamples.map(f3).mkString("[", ",", "]")},""" +
      s""""shuffle":${probeShufSamples.map(f3).mkString("[", ",", "]")}}"""
    val noisyJson =
      if (noisyReps.isEmpty) ""
      else noisyReps.map { case (k, ts) =>
        s"\"" + k + "\":" + ts.map(f3).mkString("[", ",", "]")
      }.mkString(",\"noisy_reps\":{", ",", "}")
    val probes = s""""probe_pre":${probeJson(probePre)},"probe_post":${probeJson(probePost)}""" +
      probeBand +
      (if (predFailed.isEmpty) ""
       else predFailed.distinct.sorted
         .mkString(",\"pred_failed\":[\"", "\",\"", "\"]"))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Full line carries every raw probe sample; the compact tail line
    // below carries only the [min, median, max] band (tail-buffer budget).
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,$probes$probeSamplesJson$noisyJson,"sf":"$sfDir"}"""
    println(line)
    // The stdout consumer captures only the last ~2000 chars of this
    // process's output, which truncates the ~220-entry map's HEAD — so
    // the FULL table is also written to a file (durable per-round
    // history: each query judged against its own prior number, not just
    // whichever slice survived the tail buffer).
    // A FILTERED run must never clobber the full-table history file —
    // default subset output goes to its own file.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (filter.isEmpty) "bench_full.json" else "bench_subset.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Per-LEG durable table (r15, verdict item 2): the r14 8-core
    // scaling leg clobbered bench_full.json, leaving NO full 32-core
    // table anywhere. Every unfiltered default-output run now also
    // writes a core-count-suffixed copy, so legs at different core
    // counts can never overwrite each other's full table.
    if (filter.isEmpty && sys.env.get("SPARK_GRAFT_BENCH_OUT").isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"bench_full_c$cpus.json"),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // LAST line: a compact summary guaranteed to fit whole inside the
    // consumer's tail buffer (total + the slowest queries, map capped at
    // ~1.2 kB), so the driver-side artifact parses on its own even
    // though the full line above arrives head-truncated. Slowest-first:
    // if only one slice survives, it should be the one worth reading.
    val slowest = results.sortBy(-_._2).iterator
      .map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .scanLeft(("", 0)) { case ((_, len), e) => (e, len + e.length + 1) }
      .drop(1).takeWhile(_._2 <= 1200).map(_._1).toSeq
    val compact = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${
      slowest.mkString("{", ",", "}")},"n_queries":${results.size},"n_noisy":${noisyReps.size},$probes,"sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
