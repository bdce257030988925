package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Sf1Gen.plantedJaccardEvents]]'s declared pair arithmetic
  * against the REGISTERED g09 operator itself: a corpus of only planted
  * streams must yield exactly the Scaladoc's 18 qualifying pairs per
  * replica with jac ∈ {0.5, 0.8, 1.0} in the declared multiplicities,
  * replica-linear, and contribute ZERO proximity edges (the g03/g10
  * graphs must not see the plants). If the stream layout, the 400 s
  * spacing, or g09's neighbor/cap semantics drift, this fails before a
  * multi-hour scale gate does. */
class PlantedPairsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def plantedDir(reps: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("planted_g09").toString
    Sf1Gen.plantedJaccardEvents(spark, reps, 100000L, 90000L,
        r => 1704412800000000L + r * 86400L * 1000000L)
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted streams produce exactly the declared g09 pairs, replica-linear") {
    for (reps <- Seq(1, 2)) {
      val out = SparkEntry.queries("g09_jaccard")(spark, plantedDir(reps))
        .select(col("a_id"), col("b_id"), col("jac")).collect()
      assert(out.length == 18 * reps, s"reps=$reps rows=${out.length}")
      val byJac = out.groupBy(_.getDouble(2)).view.mapValues(_.length).toMap
      assert(byJac == Map(1.0 -> 13 * reps, 0.8 -> reps, 0.5 -> 4 * reps),
        s"reps=$reps jac multiset=$byJac")
      // every pair is replica-local and inside the planted user slot
      assert(out.forall { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        a / 100000L == b / 100000L && a % 100000L >= 90000L && b % 100000L >= 90000L
      })
    }
  }

  test("planted events stay out of every proximity window (400 s > 300 s)") {
    val d = plantedDir(2)
    // the g03 edge rule, replayed at its widest window: zero edges
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
    val prox = Tables.events(spark, d)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("src", lag(col("user_id"), 1).over(w))
      .withColumn("src_ts", lag(col("ts_us"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("user_id")
        && col("ts_us") - col("src_ts") <= 300L * 1000000L)
    assert(prox.count() == 0L)
  }
}
