package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

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

  test("d05 embedding near-dups are symmetric-free and above threshold") {
    val rows = run("d05_dedup_embedding").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getAs[Double]("cos_sim") >= 0.45))
  }
}
