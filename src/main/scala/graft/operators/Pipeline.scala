package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.graft.TextHash.shingleHashSet

/** The operators composed as one curation flow — the shape this library
  * actually runs in production: raw corpus → canonical form → quality
  * gate → exact-dedup keeper selection → benchmark decontamination →
  * training-ready survivors.
  *
  * Everything before the two joins is a single map-side pass over the
  * scan (normalize + tokenize + score fuse into one projection); the
  * dedup groupBy shuffles one md5 per doc; decontamination broadcasts
  * the benchmark gram set. At 100 TB: one full shuffle total (the
  * dedup), everything else scan-speed — which is the budget a curation
  * pass must hit to be runnable per-crawl.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(
    ("p01_curation_pipeline",
      (s, d) => {
        val stop = Seq("the", "a", "of", "and", "is")
        // Stage 1 (map-side): canonical text + quality features.
        val norm = Tables.documents(s, d)
          .select(col("doc_id"),
            trim(regexp_replace(
              regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
              " +", " ")).as("norm_text"))
          .select(col("doc_id"), col("norm_text"), split(col("norm_text"), " ").as("w"))
          .select(col("doc_id"), col("norm_text"),
            size(col("w")).cast("long").as("n_words"),
            (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("ttr"),
            (size(filter(col("w"), x => x.isInCollection(stop))).cast("double") / size(col("w")))
              .as("stop_ratio"))
          .withColumn("quality",
            least(lit(1.0), col("n_words").cast("double") / 100.0) * 0.5
              + col("ttr") * 0.3 + (lit(1.0) - col("stop_ratio")) * 0.2)
        // Stage 2: quality gate.
        val qualified = norm.filter(col("quality") >= 0.5)
        // Stage 3: exact-dedup keeper (min doc_id per canonical hash).
        val keepers = qualified.groupBy(md5(col("norm_text")).as("h"))
          .agg(min(col("doc_id")).as("keeper_id"))
        val deduped = qualified
          .join(keepers, md5(col("norm_text")) === col("h"))
          .filter(col("doc_id") === col("keeper_id"))
        // Stage 4: benchmark decontamination (anti-join on 5-gram hashes).
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), explode(shingleHashSet(col("text"), 5)).as("g"))
        val benchGrams = grams.filter(col("doc_id") < 5).select(col("g")).distinct()
        val contaminated = grams.filter(col("doc_id") >= 5)
          .join(broadcast(benchGrams), "g")
          .select(col("doc_id")).distinct()
        deduped.filter(col("doc_id") >= 5)
          .join(contaminated.withColumnRenamed("doc_id", "bad_id"),
            col("doc_id") === col("bad_id"), "left_anti")
          .select(col("doc_id"), col("n_words"),
            (floor(col("quality") * 1000000 + 0.5) / 1000000).as("quality"))
      },
      Some("""WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(
                         regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                         ' +', ' ', 'g')) AS norm_text
                FROM documents),
              feats AS (
                SELECT doc_id, norm_text,
                       len(string_split(norm_text, ' ')) AS n_words,
                       len(list_distinct(string_split(norm_text, ' '))) * 1.0
                         / len(string_split(norm_text, ' ')) AS ttr,
                       len(list_filter(string_split(norm_text, ' '),
                         x -> x IN ('the','a','of','and','is'))) * 1.0
                         / len(string_split(norm_text, ' ')) AS stop_ratio
                FROM norm),
              scored AS (
                SELECT doc_id, norm_text, n_words,
                       least(1.0, n_words * 1.0 / 100.0) * 0.5 + ttr * 0.3
                         + (1.0 - stop_ratio) * 0.2 AS quality
                FROM feats),
              qualified AS (SELECT * FROM scored WHERE quality >= 0.5),
              keepers AS (SELECT md5(norm_text) AS h, min(doc_id) AS keeper_id
                          FROM qualified GROUP BY md5(norm_text)),
              deduped AS (SELECT q.* FROM qualified q JOIN keepers k
                          ON md5(q.norm_text) = k.h AND q.doc_id = k.keeper_id),
              toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              idx AS (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
                      FROM toks WHERE len(w) >= 5),
              sh5 AS (SELECT DISTINCT doc_id,
                        w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS sg
                      FROM idx),
              bench AS (SELECT DISTINCT sg FROM sh5 WHERE doc_id < 5),
              bad AS (SELECT DISTINCT s.doc_id FROM sh5 s JOIN bench b ON s.sg = b.sg
                      WHERE s.doc_id >= 5)
              SELECT d.doc_id, d.n_words,
                     FLOOR(d.quality * 1000000 + 0.5) / 1000000 AS quality
              FROM deduped d
              WHERE d.doc_id >= 5
                AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)"""))
  )
}
