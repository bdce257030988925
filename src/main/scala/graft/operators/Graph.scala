package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Graph analytics over the event stream — the iterative-join family.
  *
  * The reference has no graph surface; this is the training-data-pipeline
  * extension of its iterative executor loop (andb/executor/volcano.py runs
  * one plan at a time — here every iteration IS one declarative plan, and
  * the loop lives in the driver, the spark.ml/GraphX idiom).
  *
  * g01 is PageRank (Page et al. 1999, public algorithm) over the implicit
  * "interaction graph": within each event_type stream ordered by time, an
  * edge connects consecutive actors (who-follows-whom-in-the-stream). The
  * same shape serves any real edge table.
  *
  * Scale design, per iteration: ranks⋈edges is the ONLY corpus-sized
  * join, hash-partitioned on the join key; the dangling-mass and node
  * count are 1-row aggregates broadcast by crossJoin; lineage is cut with
  * localCheckpoint every iteration (the d06/d09 CC-loop discipline —
  * without it Catalyst re-plans a 10-deep join tree). On a cluster the
  * edge table is written ONCE bucketed by src (sources/Io bucketing), so
  * the per-iteration join shuffles only the rank side — the same
  * standing-layout argument AnnIndexSpec proves for the ANN family.
  *
  * Float discipline: each iteration's rank is landed on a 1e-9 grid with
  * IDENTICAL expression order on both engines ([[graft-float-discipline]]
  * — the contribution sum is merge-order-dependent, the grid
  * re-synchronizes engines after every iteration, so ten iterations stay
  * bit-identical instead of compounding drift).
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  private val Iters = 10

  private def grid9(c: Column): Column = floor(c * 1000000000L + 0.5) / 1000000000L

  /** Directed interaction edges: consecutive distinct actors in each
    * event_type stream, ordered by (ts, event_id) — deterministic. */
  private[graft] def interactionEdges(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("src", lag(col("user_id"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("user_id"))
      .select(col("src"), col("user_id").as("dst"))
      .distinct()
  }

  /** PageRank with damping 0.85, dangling mass redistributed uniformly
    * (the standard formulation), fixed iteration count for a
    * deterministic, oracle-replayable result. */
  private[graft] def pageRank(s: SparkSession, d: String, iters: Int): DataFrame = {
    val edges = interactionEdges(s, d).localCheckpoint()
    val nodes = Tables.events(s, d).select(col("user_id").as("id"))
      .distinct().localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    var ranks = nodes.crossJoin(nn)
      .select(col("id"), (lit(1.0) / col("n")).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("r") / col("deg")).as("cin"))
      val dang = ranks
        .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dang"))
      ranks = nodes.crossJoin(nn).crossJoin(dang)
        .join(contribs, col("id") === col("dst"), "left")
        .select(col("id"),
          grid9(lit(0.15) / col("n") +
            lit(0.85) * (coalesce(col("cin"), lit(0.0)) + col("dang") / col("n"))).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("id").as("user_id"), col("r").as("rank"))
  }

  /** The identical computation unrolled as DuckDB CTEs — one (contrib,
    * dangling, rank) triple per iteration, every float expression in the
    * same op order as the Spark plan, gridded per iteration. Every CTE is
    * AS MATERIALIZED: each r$i is referenced twice by iteration i+1
    * (contribs + dangling), and DuckDB's default CTE INLINING would copy
    * the whole chain per reference — 2^iters plan blowup. */
  private def pageRankOracle(iters: Int): String = {
    val head =
      """WITH ev AS MATERIALIZED (
        |  SELECT event_type, user_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_id
        |  FROM events),
        |lagged AS MATERIALIZED (
        |  SELECT user_id,
        |         lag(user_id) OVER (PARTITION BY event_type
        |                            ORDER BY ts_us ASC, event_id ASC) AS src
        |  FROM ev),
        |edges AS MATERIALIZED (
        |  SELECT DISTINCT src, user_id AS dst FROM lagged
        |  WHERE src IS NOT NULL AND src <> user_id),
        |nodes AS MATERIALIZED (SELECT DISTINCT user_id AS id FROM ev),
        |deg AS MATERIALIZED (
        |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
        |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |r0 AS MATERIALIZED (SELECT id, 1.0 / nn.n AS r FROM nodes, nn)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT e.dst, sum(r.r / d.deg) AS cin
         |  FROM edges e JOIN deg d ON e.src = d.src
         |  JOIN r${i - 1} r ON r.id = e.src GROUP BY 1),
         |g$i AS MATERIALIZED (
         |  SELECT coalesce(sum(r.r), CAST(0 AS DOUBLE)) AS dang
         |  FROM r${i - 1} r LEFT JOIN deg d ON r.id = d.src
         |  WHERE d.src IS NULL),
         |r$i AS MATERIALIZED (
         |  SELECT nd.id,
         |         FLOOR((CAST(0.15 AS DOUBLE) / nn.n
         |                + CAST(0.85 AS DOUBLE) * (coalesce(c.cin, CAST(0 AS DOUBLE))
         |                                          + g.dang / nn.n))
         |               * 1000000000 + 0.5) / 1000000000 AS r
         |  FROM nodes nd CROSS JOIN nn CROSS JOIN g$i g
         |  LEFT JOIN c$i c ON nd.id = c.dst)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT id AS user_id, r AS rank FROM r$iters"
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("g01_pagerank",
      (s, d) => pageRank(s, d, Iters),
      Some(pageRankOracle(Iters)))
  )
}
