package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** OCC / exactly-once ledger PROPERTY test (r12 verdict stretch #8):
  * VersionedSpec pins the protocol on hand-written examples; the
  * fold-back now rides the same ledger, so the invariants get pinned on
  * GENERATED schedules — random interleavings of committing writers,
  * replayed batches, aborted transactions, fold marker pairs, and
  * 3-writer parallel bursts that race the put-if-absent rename and
  * exercise the rebase path for real.
  *
  * Invariants asserted after every schedule, on the table's own state
  * (never on bookkeeping the schedule kept for itself):
  *
  *   1. versions are exactly 1..current — monotone, gapless, no
  *      version lost to a conflict retry;
  *   2. no lost commit / exactly-once: the table's rows are EXACTLY
  *      one copy of every first-time-committed batch payload — replays
  *      add nothing, aborts add nothing, racing writers all land;
  *   3. fold windows partition the admissions: with done-marker
  *      fold-through versions d1 < … < dk, changesBetween over (0,d1],
  *      (d1,d2], …, (dk,current] covers every committed row exactly
  *      once — the "no double fold / no skipped row" half of fold
  *      exactly-once, independent of the layout kernels.
  *
  * Fixed Gen seeds — deterministic run-to-run. GRAFT_OCC_SCHEDULES
  * overrides the schedule count (default sized for the CI suite; the
  * 500+-schedule evidence leg is a one-off, recorded in BASELINE.md). */
class VersionedOccPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import graft.sources.Versioned
  import spark.implicits._

  private sealed trait Op
  private case class Commit(writer: Int) extends Op
  private case class Replay(back: Int) extends Op
  private case object AbortOp extends Op
  private case object Fold extends Op
  private case object Burst extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> Gen.chooseNum(0, 2).map(Commit),
    2 -> Gen.chooseNum(1, 4).map(Replay),
    1 -> Gen.const(AbortOp),
    2 -> Gen.const(Fold),
    1 -> Gen.const(Burst))
  private val genSchedule: Gen[List[Op]] =
    Gen.chooseNum(4, 12).flatMap(n => Gen.listOfN(n, genOp))

  /** Every fold-through version a done marker committed, ascending.
    * The manifest meta line format `#txn=<app>/<batchId>` is part of
    * the documented commit protocol (Versioned Scaladoc), so the spec
    * reads it directly — the ledger's own source of truth, not spec
    * bookkeeping. */
  private def doneFoldVersions(path: String): Seq[Long] = {
    val dir = new java.io.File(s"$path/_versions")
    if (!dir.exists()) return Seq.empty
    dir.listFiles().toSeq.filter(_.getName.endsWith(".manifest"))
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f)
        try src.getLines().filter(_.startsWith("#txn=t.fold.done/"))
          .map(_.stripPrefix("#txn=t.fold.done/").toLong).toList
        finally src.close()
      }
      .distinct.sorted
  }

  test("OCC ledger invariants hold over generated writer/replay/abort/fold/burst schedules") {
    val schedules =
      sys.env.get("GRAFT_OCC_SCHEDULES").flatMap(_.toIntOption).getOrElse(40)
    val root = java.nio.file.Files.createTempDirectory("graft-occ").toString
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global

    for (s <- 0 until schedules) {
      val ops = genSchedule.pureApply(Gen.Parameters.default, Seed(7700L + s))
      val path = s"$root/t$s"
      var uid = 0L
      val nextBatch = scala.collection.mutable.Map(0 -> 0L, 1 -> 0L, 2 -> 0L)
      // (writer, batchId, uid) of every FIRST-TIME issued commit.
      val issued = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      def payload(w: Int, b: Long, u: Long) =
        Seq((w, b, u)).toDF("w", "b", "u").coalesce(1)
      def issueSlot(w: Int): (Int, Long, Long) = this.synchronized {
        val b = nextBatch(w); nextBatch(w) = b + 1
        uid += 1
        issued += ((w, b, uid))
        (w, b, uid)
      }
      def commitOnce(w: Int): Unit = {
        val (w2, b, u) = issueSlot(w)
        val r = Versioned.commitBatchAppend(spark, path, s"w$w2", b, payload(w2, b, u))
        assert(r.nonEmpty, s"schedule $s: first-time commit (w$w2,$b) was skipped")
      }
      ops.foreach {
        case Commit(w) => commitOnce(w)
        case Replay(back) if issued.nonEmpty =>
          val (w, b, u) = issued(math.max(0, issued.size - back))
          // Crash-recovery re-issue of an already-durable batch: the
          // ledger must skip it (returns None), not double-append.
          assert(Versioned.commitBatchAppend(spark, path, s"w$w", b,
            payload(w, b, u)).isEmpty, s"schedule $s: replay (w$w,$b) landed twice")
        case Replay(_) => () // nothing issued yet
        case AbortOp =>
          if (issued.isEmpty) commitOnce(0) // abort needs an existing table
          val txn = Versioned.begin(spark, path)
          uid += 1
          Versioned.stage(txn, payload(9, -1L, uid))
          Versioned.abort(spark, txn)
        case Fold =>
          if (issued.isEmpty) commitOnce(1)
          // refreshCorpusLayout's marker discipline verbatim: intent@v
          // then done@v, short-circuit when already folded through v.
          val v = Versioned.currentVersion(spark, path)
          val doneV = Versioned.lastCommittedBatch(spark, path, "t.fold.done")
          if (!doneV.exists(_ >= v)) {
            Versioned.commitBatchAppend(spark, path, "t.fold.intent", v,
              Versioned.read(spark, path).limit(0))
            Versioned.commitBatchAppend(spark, path, "t.fold.done", v,
              Versioned.read(spark, path).limit(0))
          }
        case Burst =>
          // Three writers race begin→stage→rename concurrently; the
          // losers must rebase and land, not vanish. (First burst on an
          // unborn table: creation itself is raced — also legal.)
          val slots = (0 to 2).map(issueSlot)
          val fs = slots.map { case (w, b, u) => Future {
            val r = Versioned.commitBatchAppend(spark, path, s"w$w", b,
              payload(w, b, u))
            assert(r.nonEmpty, s"schedule $s: burst commit (w$w,$b) was skipped")
          } }
          Await.result(Future.sequence(fs), 120.seconds)
      }
      if (issued.isEmpty) commitOnce(0) // degenerate schedule: still check a table

      // ---- invariant 1: monotone, gapless versions ---------------------
      val vs = Versioned.versions(spark, path)
      assert(vs == (1L to vs.size.toLong),
        s"schedule $s: version chain $vs is not 1..${vs.size}")
      // ---- invariant 2: exactly-once, no lost commit -------------------
      val got = Versioned.read(spark, path)
        .select(col("w"), col("b"), col("u"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got.sorted == issued.toSeq.sorted,
        s"schedule $s: table rows != first-time commits " +
          s"(missing=${(issued.toSet -- got.toSet).take(3)}, " +
          s"extra=${(got.toSet -- issued.toSet).take(3)})")
      // ---- invariant 3: fold windows partition the admissions ----------
      val current = Versioned.currentVersion(spark, path)
      val bounds = (doneFoldVersions(path) :+ current).distinct.sorted
      val windowRows = (0L +: bounds).zip(bounds).map { case (lo, hi) =>
        if (lo >= hi) Seq.empty
        else Versioned.changesBetween(spark, path, lo, hi)
          .select(col("w"), col("b"), col("u"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      }
      val all = windowRows.flatten
      assert(all.size == all.toSet.size,
        s"schedule $s: a row appears in two fold windows (double fold)")
      assert(all.toSet == issued.toSet,
        s"schedule $s: fold windows miss rows (skipped fold): " +
          s"${(issued.toSet -- all.toSet).take(3)}")
    }
  }
}
