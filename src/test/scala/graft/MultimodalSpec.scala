package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("m01 prunes on typed metadata before decode and extracts features") {
    val rows = Multimodal.defs.find(_._1 == "m01_multimodal_meta").get
      ._2(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val formats = rows.map(_.getString(0)).toSet
    assert(formats.subsetOf(Set("jpeg", "png")), s"wav must be pruned: $formats")
    assert(rows.forall(_.getAs[Long]("n_media") > 0))
    assert(rows.forall(_.getAs[Long]("total_bytes") > 0))
  }

  test("m02 samples every 4th fixed-size frame per payload") {
    val rows = Multimodal.defs.find(_._1 == "m02_frame_sample").get
      ._2(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_frames") >= 1)
      val b = r.getAs[Long]("avg_brightness_micros")
      assert(b >= 0 && b <= 1000000)
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }
}
