package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-layout maintenance PROPERTY test (r13 verdict item 5):
  * VersionedOccPropertySpec pins the LEDGER invariants on generated
  * schedules; the layout's maintenance ops — fold, killed fold,
  * compaction, TORN compaction (both crash windows of the shadow swap)
  * — were only ever asserted in example-based AnnIndexSpec sequences.
  * This spec generates random interleavings of the full maintenance
  * surface against a real (tiny) corpus dedup layout and asserts, per
  * schedule, the two invariants the whole machine exists for:
  *
  *   1. exactly-once admission — the admitted log holds EXACTLY the
  *      fresh slices (corpus duplicates rejected every time, nothing
  *      admitted twice), across any interleaving of folds, killed
  *      folds, compactions, and torn compactions;
  *   2. fold ≡ rebuild — after a closing fold, the standing layout is
  *      row-identical to a from-scratch rebuild on corpus + admissions,
  *      and no `__compact` shadow table is left behind.
  *
  * Torn states are injected as the exact crash-window catalog states:
  * TornFwd = shadow complete + original dropped (a death between DROP
  * and RENAME — roll-forward territory); TornBack = shadow complete
  * beside the live original (a death before DROP — roll-back
  * territory). Writer entry points (sink, fold, compaction) must
  * recover them in stride; the generator deliberately lets an Admit
  * land right on a torn state, the interleaving the r13 advice called
  * out as untested.
  *
  * Fixed Gen seeds — deterministic run-to-run. GRAFT_LAYOUT_SCHEDULES
  * overrides the schedule count (default sized for the CI suite; the
  * big evidence leg is a one-off recorded in BASELINE.md). */
class CorpusLayoutPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import graft.operators.{Dedup, Lsh}
  import graft.sources.{Io, Versioned}

  // Small geometry: same code paths as production (128/8), sized so a
  // schedule is seconds, not minutes. parts MUST agree between layout
  // writes and probes — pb is `hash(band, sig) % parts`.
  private val Parts = 8
  private val Buckets = 1

  private sealed trait Op
  private case object Admit extends Op
  private case object Fold extends Op
  private case object KilledFold extends Op
  private case object Compact extends Op
  private case class TornFwd(grams: Boolean) extends Op
  private case class TornBack(grams: Boolean) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> Gen.const(Admit),
    3 -> Gen.const(Fold),
    1 -> Gen.const(KilledFold),
    2 -> Gen.const(Compact),
    1 -> Gen.oneOf(true, false).map(TornFwd),
    1 -> Gen.oneOf(true, false).map(TornBack))
  private val genSchedule: Gen[List[Op]] =
    Gen.chooseNum(4, 10).flatMap(n => Gen.listOfN(n, genOp))

  test("layout maintenance invariants hold over generated admit/fold/killed-fold/compact/torn-compact schedules") {
    val schedules =
      sys.env.get("GRAFT_LAYOUT_SCHEDULES").flatMap(_.toIntOption).getOrElse(6)
    val root = java.nio.file.Files.createTempDirectory("graft-layout-occ").toString
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .localCheckpoint()
    val corpus = docs.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val pool = docs.filter(col("doc_id") % 10 =!= 0).localCheckpoint()

    for (s <- 0 until schedules) {
      val ops = genSchedule.pureApply(Gen.Parameters.default, Seed(9200L + s))
      val prefix = s"glp_$s"
      val admitted = s"$root/adm_$s"
      def layoutTables = Seq(s"${prefix}_bands", s"${prefix}_hashes", s"${prefix}_grams")
      (layoutTables ++ layoutTables.map(_ + "__compact") ++
        layoutTables.map(_.replace(prefix, prefix + "_rb")))
        .foreach(t => graft.Ddl.dropManagedTable(spark, t))
      Dedup.writeCorpusDedupLayout(corpus, prefix, parts = Parts, buckets = Buckets)

      var epoch = 0
      val slices = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val expectedAdmitted = scala.collection.mutable.Set.empty[Long]
      def textStore: DataFrame =
        (docs +: slices.toSeq).reduce(_ unionByName _).select(col("doc_id"), col("text"))

      // The production sink's body with the spec's geometry (the
      // registered sink hard-pins the 128/8 production geometry):
      // writer-entry torn recovery, probe, ledger commit.
      def admitOnce(): Unit = {
        epoch += 1
        // Per-WORD vocab transform (the SoakMain construction): the
        // corpus carries planted near-dup pairs, so a prefix-only
        // transform would leave fresh docs that the engine correctly
        // rejects as near-dups of standing docs — every shingle must
        // change for "always admitted" to be a sound expectation.
        val fresh = pool.filter(col("doc_id") % 37 === epoch % 37)
          .select((col("doc_id") + (10000000L + epoch * 100000L)).as("doc_id"),
            array_join(transform(split(col("text"), " "),
              w => concat(lit(s"s${s}e${epoch}v"), w)), " ").as("text"),
            col("source"), col("n_chars"))
        val dup = corpus.filter(col("doc_id") % 13 === epoch % 13)
          .select((col("doc_id") + (50000000L + epoch * 100000L)).as("doc_id"),
            col("text"), col("source"), col("n_chars"))
        val batch = fresh.unionByName(dup).localCheckpoint()
        slices += batch
        expectedAdmitted ++= fresh.select(col("doc_id")).collect().map(_.getLong(0))
        Seq(s"${prefix}_grams", s"${prefix}_hashes")
          .foreach(Io.finishTornCompaction(spark, _))
        val surv = Dedup.incrementalDedupOnLayout(spark, prefix, batch, parts = Parts)
        Versioned.commitBatchAppend(spark, admitted, "glpapp", epoch.toLong, surv)
      }
      def unfoldedDelta: DataFrame = {
        val v = Versioned.currentVersion(spark, admitted)
        val doneV = Versioned.lastCommittedBatch(spark, admitted, s"$prefix.fold.done")
        Versioned.changesBetween(spark, admitted, doneV.getOrElse(0L), v)
          .select(col("doc_id"))
      }
      def swapTable(grams: Boolean) = if (grams) s"${prefix}_grams" else s"${prefix}_hashes"

      ops.foreach {
        case Admit => admitOnce()
        case Fold =>
          if (epoch == 0) admitOnce()
          Dedup.refreshCorpusLayout(spark, prefix, admitted, textStore,
            parts = Parts, buckets = Buckets)
        case KilledFold =>
          if (epoch == 0) admitOnce()
          val delta = unfoldedDelta.join(textStore, Seq("doc_id"))
          if (!delta.isEmpty) {
            // The fold's crash window: intent marker + a PARTIAL bands
            // append, no grams/hashes, no done marker. The torn rows
            // must be recovered (not duplicated) by whichever fold runs
            // next. Recover swap state first — this is a writer too.
            Seq(s"${prefix}_grams", s"${prefix}_hashes")
              .foreach(Io.finishTornCompaction(spark, _))
            val v = Versioned.currentVersion(spark, admitted)
            Versioned.commitBatchAppend(spark, admitted, s"$prefix.fold.intent", v,
              Versioned.read(spark, admitted).limit(0))
            val bt = Lsh.minhashBandTable(delta, 3, 8, 4)
              .withColumn("pb", pmod(hash(col("band"), col("sig")), lit(Parts)))
            Io.appendPartitionedBucketed(bt.filter(col("pb") % 2 === 0),
              s"${prefix}_bands", Seq("pb"), Seq("band", "sig"), Buckets)
          }
        case Compact =>
          // maxFilesPerBucket=0 so every populated table rewrites — the
          // property is about interleaving safety, not thresholds.
          Dedup.compactCorpusLayout(spark, prefix, maxFilesPerBucket = 0)
        case TornFwd(g) =>
          val t = swapTable(g)
          if (spark.catalog.tableExists(t) &&
              !spark.catalog.tableExists(s"${t}__compact"))
            spark.sql(s"ALTER TABLE `$t` RENAME TO `${t}__compact`")
        case TornBack(g) =>
          val t = swapTable(g)
          if (spark.catalog.tableExists(t) &&
              !spark.catalog.tableExists(s"${t}__compact")) {
            val meta = spark.sessionState.catalog.getTableMetadata(
              org.apache.spark.sql.catalyst.TableIdentifier(t))
            val spec = meta.bucketSpec.get
            val keys = spec.bucketColumnNames
            spark.table(t).write
              .bucketBy(spec.numBuckets, keys.head, keys.tail: _*)
              .sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
              .format("parquet").saveAsTable(s"${t}__compact")
          }
      }

      // Closing fold: recovers any torn swap / torn fold and folds the
      // remaining admissions, so the invariants compare settled states.
      if (epoch == 0) admitOnce()
      Dedup.refreshCorpusLayout(spark, prefix, admitted, textStore,
        parts = Parts, buckets = Buckets)

      // ---- invariant 1: exactly-once admission -------------------------
      val got = Versioned.read(spark, admitted)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      assert(got.size == got.toSet.size,
        s"schedule $s (${ops.mkString(",")}): double admission")
      assert(got.toSet == expectedAdmitted.toSet,
        s"schedule $s (${ops.mkString(",")}): admitted set wrong " +
          s"(missing=${(expectedAdmitted -- got.toSet).take(3)}, " +
          s"extra=${(got.toSet -- expectedAdmitted).take(3)})")

      // ---- invariant 2: fold ≡ rebuild, no shadows left ----------------
      layoutTables.foreach { t =>
        assert(spark.catalog.tableExists(t), s"schedule $s: $t missing")
        assert(!spark.catalog.tableExists(s"${t}__compact"),
          s"schedule $s: shadow ${t}__compact left behind")
      }
      val rb = s"${prefix}_rb"
      val admittedTexts = Versioned.read(spark, admitted)
        .select(col("doc_id")).join(textStore, Seq("doc_id"))
      Dedup.writeCorpusDedupLayout(
        corpus.select(col("doc_id"), col("text")).unionByName(admittedTexts),
        rb, parts = Parts, buckets = Buckets)
      def snap(p: String): Seq[Seq[String]] =
        Seq(s"${p}_bands", s"${p}_hashes", s"${p}_grams")
          .map(t => spark.table(t).collect().map(_.toString).sorted.toSeq)
      assert(snap(prefix) == snap(rb),
        s"schedule $s (${ops.mkString(",")}): fold != rebuild")
      (layoutTables ++ layoutTables.map(_.replace(prefix, rb)))
        .foreach(t => graft.Ddl.dropManagedTable(spark, t))
      slices.foreach(graft.unpersistCheckpoint)
      slices.clear()
    }
  }
}
