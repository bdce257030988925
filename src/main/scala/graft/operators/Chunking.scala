package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The t35/d19 chunk rule — ONE definition of the window geometry
  * (size/stride/tail clamp/content hash) shared by t35 (the chunk
  * stream itself) and d19 (dedup over it), so the chunking a dedup
  * audits can never drift from the chunking the pipeline emits.
  *
  * Deliberately its OWN object: TextAnalysis's defs eagerly interpolate
  * Dedup CTEs at object init, so a Dedup→TextAnalysis eager reference
  * back would close a bidirectional <clinit> cycle — two threads
  * first-touching the two objects concurrently would deadlock in JVM
  * class initialization. Both sides depending on this leaf object keeps
  * initialization a DAG.
  */
private[graft] object Chunking {

  /** Window geometry — 32-token windows, stride 24 (8-token overlap so
    * no boundary-spanning n-gram is lost to retrieval/embedding). */
  val ChunkSize = 32
  val ChunkStride = 24

  /** The chunk stream: pure per-row HOF arithmetic (`sequence` stride
    * grid, `posexplode` + `slice` windows) inside whole-stage codegen —
    * ZERO shuffles, so at 100 TB this runs at parquet-scan speed.
    * Output: (doc_id, chunk_idx, start_word, n_tokens, chunk_hash). */
  def chunked(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), size(col("ws")) - 1, lit(ChunkStride)))
          .as(Seq("pos", "start")),
        col("ws"))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_word"),
        slice(col("ws"), col("start") + 1, lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_word"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))

  /** Oracle twin of [[chunked]]: CTEs ending in
    * `ch(doc_id, chunk_idx, start_word, n_tokens, chunk_hash)` —
    * DuckDB's 1-based inclusive list slicing re-derives the stride
    * grid, tail clamp and hashes. */
  val chunkOracleCte: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |st AS (SELECT doc_id, ws, unnest(range(0, len(ws), $ChunkStride)) AS start FROM w),
       |ch AS (SELECT doc_id,
       |              CAST(start // $ChunkStride AS BIGINT) AS chunk_idx,
       |              CAST(start AS BIGINT) AS start_word,
       |              CAST(len(ws[start + 1 : start + $ChunkSize]) AS BIGINT) AS n_tokens,
       |              md5(array_to_string(ws[start + 1 : start + $ChunkSize], ' ')) AS chunk_hash
       |       FROM st)""".stripMargin
}
