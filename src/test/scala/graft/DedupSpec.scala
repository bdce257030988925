package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import org.apache.spark.sql.graft.TextHash.shingleHashSet
import org.apache.spark.sql.graft.VectorExpressions.cosine

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def run(name: String) =
    Dedup.defs.find(_._1 == name).get._2(spark, TestSpark.sf)

  private def pairs(name: String): Set[(Long, Long)] =
    run(name).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d01 exact dedup finds every planted re-crawl copy") {
    val rows = run("d01_dedup_exact").collect()
    assert(rows.nonEmpty)
    // Planted copies: every 10th doc_id re-ingested once → groups of 2.
    assert(rows.forall(_.getAs[Long]("n_copies") == 2L))
  }

  test("d02 MinHash-LSH finds exactly the exact-Jaccard >= 0.9 pairs") {
    val lsh = pairs("d02_dedup_minhash")
    val exact = run("d04_dedup_ngram").filter("jac >= 0.9")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}")
  }

  test("d03 SimHash hamming<=3 pairs are true near-duplicates") {
    val sim = pairs("d03_dedup_simhash")
    val nearDup = pairs("d04_dedup_ngram") // all pairs with jac >= 0.2
    assert(sim.nonEmpty)
    assert(sim.subsetOf(nearDup),
      s"simhash-only pairs: ${sim.diff(nearDup).take(5)}")
  }

  test("d03 banded join equals brute-force popcount over signatures (sf0.01 + sf0.1)") {
    // Pins the pigeonhole band join against an exact in-engine truth: the
    // hamming-≤3 pair set from the 4×16-bit band join must EQUAL the one
    // a popcount over all signature pairs computes — not merely be
    // consistent with d04's Jaccard view. Run at two scales so a banding
    // bug that only manifests with more collisions can't hide.
    import org.apache.spark.sql.graft.TextHash.simHash64
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val sig = Tables.documents(spark, sf)
        .select(col("doc_id"), simHash64(col("text")).as("sig"))
      val brute = sig.select(col("doc_id").as("a_id"), col("sig").as("sa"))
        .join(sig.select(col("doc_id").as("b_id"), col("sig").as("sb")),
          col("a_id") < col("b_id"))
        .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val banded = Dedup.defs.find(_._1 == "d03_dedup_simhash").get._2(spark, sf)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute,
        s"$sf: banded=${banded.size} brute=${brute.size} " +
          s"missing=${brute.diff(banded).take(5)} extra=${banded.diff(brute).take(5)}")
      assert(brute.nonEmpty, s"$sf: vacuous — no hamming<=3 pairs at all")
    }
  }

  test("d06 groups cover every >=0.9 pair with the component-min keeper") {
    val groups = run("d06_dedup_groups").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    val pairs = run("d04_dedup_ngram").filter("jac >= 0.9")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(groups.nonEmpty)
    groups.foreach { case (keeper, size, members) =>
      val ids = members.split(",").map(_.toLong)
      assert(ids.length == size)
      assert(ids.min == keeper, s"keeper must be component min: $keeper vs $members")
    }
    // Every edge endpoint pair lands in the same group.
    val label = groups.flatMap { case (k, _, m) => m.split(",").map(_.toLong -> k) }.toMap
    pairs.foreach { case (a, b) => assert(label(a) == label(b), s"($a,$b) split") }
  }

  test("d07 stratified sample respects per-language fractions") {
    val sampled = run("d07_sample_stratified").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.Tables.documents(spark, TestSpark.sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Full-fraction strata must be exact; fractional ones within 4 sigma.
    Seq("de", "es", "fr").foreach(l => assert(sampled(l) == totals(l)))
    val en = sampled("en").toDouble / totals("en")
    assert(en > 0.2 && en < 0.8, s"en fraction=$en")
  }

  test("d05 embedding near-dups are symmetric-free, unique, above threshold") {
    val rows = run("d05_dedup_embedding").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getAs[Double]("cos_sim") >= 0.45))
    // The first-matching-band filter must emit each pair exactly once.
    val ps = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.distinct.length == ps.length, "duplicate pairs emitted")
  }

  test("d05 result is a subset of the exact truth at the MEASURED recall") {
    // The O(n²) form, kept HERE as the recall reference only. The
    // round-9 contract is banded-∧-global-Hamming candidates (geometry
    // swept offline — BASELINE.md round-9 table), so recall < 1 BY
    // DESIGN: at sf0.001 the rule keeps exactly 6 of the 7 true pairs
    // (measured from the all-pairs xor/cos export). Precision after the
    // exact-cosine verify must be 1 — any extra pair is a bug, and any
    // recall drift means the signature kernel or geometry changed.
    val e = Tables.embeddings(spark, TestSpark.sf)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val allPairs = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("ea"), col("eb")).as("cs"))
      .filter(col("cs") >= 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairs("d05_dedup_embedding")
    assert(lsh.subsetOf(allPairs), s"false positives: ${lsh.diff(allPairs).take(5)}")
    assert(allPairs.size == 7, s"truth moved: ${allPairs.size} pairs")
    assert(lsh.size == 6, s"recall drift: kept ${lsh.size}/7, " +
      s"missing=${allPairs.diff(lsh).take(5)}")
  }

  test("d26 eval metrics are self-consistent and match d05's measured recall") {
    val r = run("d26_embdedup_eval").collect()
    assert(r.length == 1)
    val row = r.head
    val (nTrue, nCand, nHits) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // sf0.001 has 500 vectors — the md5 sample IS the whole corpus, so
    // the sampled truth equals the exact truth and hits equal d05's kept
    // set (6 of 7; the candidate count is the rule's measured 4.56%).
    assert(nTrue == 7, s"n_true_pairs=$nTrue")
    assert(nHits == 6, s"n_hits=$nHits")
    assert(nCand >= nHits && nCand < 125000 / 10, s"n_candidates=$nCand")
    assert(math.abs(row.getDouble(4) - 6.0 / 7.0) < 1e-4, s"recall=${row.getDouble(4)}")
  }

  test("d10 Bloom-prefiltered decontamination equals d08 and actually prunes") {
    val exact = run("d08_contamination").collect().map(_.toSeq).toSet
    val bloomed = run("d10_contamination_bloom").collect().map(_.toSeq).toSet
    assert(bloomed == exact, s"bloom=${bloomed.size} exact=${exact.size}")
    // The prefilter must do real work: with a small bench set and 1%
    // fpp, the surviving corpus gram stream is a small fraction of the
    // full one (matches + ~1% false positives).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.TextHash.shingleHashSet
    import org.apache.spark.sql.graft.BloomExpressions
    val g = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), explode(shingleHashSet(col("text"), 5)).as("h"))
    val bench0 = g.filter(col("doc_id") < 5).select(col("h")).distinct()
    val bloom = bench0.stat.bloomFilter("h", math.max(bench0.count(), 1L), 0.01)
    val total = g.count().toDouble
    val survivors = g.filter(BloomExpressions.mightContainLong(col("h"), bloom)).count()
    assert(survivors < total * 0.30,
      s"prefilter passed $survivors of ${total.toLong} grams — not pruning")
  }

  test("d11 length-band edit-distance join equals brute-force levenshtein") {
    // The length-band candidate generation claims losslessness (edit
    // distance >= |len(a)-len(b)|, bands are (k+1)-wide, probe 3 adjacent
    // bins). Pin it against the all-pairs form computed in Spark itself.
    val k = 15
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .filter(col("n_chars") <= 256)
      .select(col("doc_id"), col("text"))
    val a = docs.select(col("doc_id").as("a_id"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("b_id"), col("text").as("tb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), levenshtein(col("ta"), col("tb")).as("ed"))
      .filter(col("ed") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    val banded = run("d11_dedup_editdist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} missing=${(brute -- banded).take(3)} extra=${(banded -- brute).take(3)}")
    assert(brute.nonEmpty, "fixture has no near-identical short docs — test is vacuous")
  }

  test("d15 PassJoin segment blocking equals d11's bands and the all-pairs form") {
    // Two independent lossless candidate schemes must verify to the
    // SAME pair set — and d15's window math (smallest-untouched-segment
    // pigeonhole, Δ ± (k−i) shift) is additionally stressed on planted
    // edits: substitutions, a deletion burst, and an insertion burst at
    // segment boundaries, each within and just beyond k.
    val banded = run("d11_dedup_editdist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pass = run("d15_editdist_passjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pass == banded,
      s"pass=${pass.size} banded=${banded.size} missing=${(banded -- pass).take(3)} extra=${(pass -- banded).take(3)}")
    assert(pass.nonEmpty, "fixture has no near-identical short docs — test is vacuous")

    import spark.implicits._
    val base = "abcdefghij" * 20 // 200 chars
    val k = 15
    val edits = Seq(
      1L -> base,
      2L -> (base.take(50) + "XXXXX" + base.drop(55)),          // 5 subst
      3L -> (base.take(100) + base.drop(112)),                  // 12-char deletion
      4L -> (base.take(150) + "YYYYYYYYYY" + base.drop(150)),   // 10-char insertion
      5L -> (base.take(20) + "Z" * 16 + base.drop(36)),         // 16 subst: beyond k
      6L -> ("Q" * 200),                                        // unrelated
      // Tiny stratum (< k+1 chars): the segment pigeonhole cannot fire
      // (all non-empty segments touched) — these pairs exercise the
      // direct length-window path.
      7L -> "abcde", 8L -> "vwxyz", 9L -> "ab")
    val df = edits.toDF("doc_id", "text")
    val got = graft.operators.Dedup.passJoinPairs(df, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = df.select(col("doc_id").as("a_id"), col("text").as("ta"))
    val b = df.select(col("doc_id").as("b_id"), col("text").as("tb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), levenshtein(col("ta"), col("tb")).as("ed"))
      .filter(col("ed") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == brute,
      s"planted: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.exists(_._3 > 0) && brute.size >= 3, s"weak fixture: $brute")
  }

  test("d12 repeated-span fractions: bounds on real data, exact counts on a planted span") {
    val rows = run("d12_dedup_spans").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    rows.foreach { case (id, (n, dup, f)) =>
      assert(n > 0 && dup >= 0 && dup <= n, s"doc $id: dup=$dup of $n")
      assert(f >= 0.0 && f <= 1.0)
    }
    assert(rows.size == 500)

    // Planted fixture THROUGH THE PRODUCTION PATH (Dedup.spanStats):
    // doc B copies a 10-word span from doc A; doc C is fully unique.
    // Exactly the 5-grams lying INSIDE the shared span are duplicated —
    // 10-5+1 = 6 positions in each of A and B (their surrounding words
    // differ, so straddling grams stay unique).
    import spark.implicits._
    val span = (0 until 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, (0 until 10).map(i => s"a$i").mkString(" ") + " " + span),
      (2L, span + " " + (0 until 10).map(i => s"b$i").mkString(" ")),
      (3L, (0 until 20).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.spanStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((16L, 6L)), s"A: ${got(1L)}")  // 20 words → 16 grams
    assert(got(2L) == ((16L, 6L)), s"B: ${got(2L)}")
    assert(got(3L) == ((16L, 0L)), s"C: ${got(3L)}")
  }

  test("d04 df-cap keeps candidates linear under a planted stop-gram") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hotgram").toString
    // 1200 docs all sharing one boilerplate gram (df=1200 > cap=1000) but
    // nothing else; one planted true near-dup pair with cold grams only.
    val docs = ((0 until 1200).map(i => (i.toLong, s"boiler plate header u$i v$i w$i")) ++
      Seq((9998L, "alpha beta gamma delta epsilon zeta"),
          (9999L, "alpha beta gamma delta epsilon zeta")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    // Candidate volume: uncapped inverted-index self-join is quadratic in
    // the stop-gram's df; the capped one generates only true candidates.
    val ex = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(shingleHashSet(col("text"))).as("h"))
    def selfJoinPairs(src: org.apache.spark.sql.DataFrame): Long = {
      val l = src.select(col("doc_id").as("a_id"), col("h"))
      val r = src.select(col("doc_id").as("b_id"), col("h"))
      l.join(r, l("h") === r("h") && col("a_id") < col("b_id")).count()
    }
    val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select(col("h"))
    val uncapped = selfJoinPairs(ex)
    val capped = selfJoinPairs(ex.join(broadcast(hot), Seq("h"), "left_anti"))
    assert(uncapped > 100000L, s"uncapped=$uncapped")
    assert(capped < 10L, s"capped=$capped")
    // The operator still finds exactly the planted pair — boilerplate
    // pairs share only the hot gram (jac 1/7 < 0.2 anyway), so the capped
    // output matches the exact all-pairs contract on this corpus too.
    val out = Dedup.defs.find(_._1 == "d04_dedup_ngram").get._2(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((9998L, 9999L)), s"out=$out")
  }

  test("d21 measures d02's banding: full recall on this corpus, sane precision") {
    val r = Dedup.defs.find(_._1 == "d21_lsh_dedup_eval").get
      ._2(spark, TestSpark.sf).collect().head
    val (nTrue, nCand, nHits) = (r.getAs[Long]("n_true_pairs"),
      r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hits"))
    assert(nTrue > 0, "fixture has planted >=0.9 pairs")
    // d02 is oracle-exact on this corpus, which REQUIRES its candidate
    // stage to cover every true pair — d21 must measure exactly that.
    assert(nHits == nTrue, s"banding missed ${nTrue - nHits} of $nTrue true pairs")
    assert(r.getAs[Double]("recall") == 1.0)
    assert(nCand >= nHits)
    val p = r.getAs[Double]("precision")
    assert(p > 0.0 && p <= 1.0, s"precision=$p")
  }
}
