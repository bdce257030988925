package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.graft.VectorExpressions.cosine
import org.apache.spark.sql.graft.TextHash.{minHashSignature, shingleHashSet, simHash64}

/** Deduplication over the `documents` table — the training-data-pipeline
  * surface the reference lacks, designed for the 100 TB regime.
  *
  * Strategy ladder (all shuffle budgets relative to corpus size n):
  *   d01 exact       — one hash-groupBy; map-side combine; O(n).
  *   d02 MinHash-LSH — the only all-pairs-free near-dup path: one
  *                     codegen'd pass computes 32 minhashes per doc, 8
  *                     bands × 4 rows hash to buckets, candidates = band-
  *                     bucket self-join, exact Jaccard verify on
  *                     candidates only. Candidate volume ~O(n·dup_rate).
  *   d03 SimHash     — 64-bit signature in one pass; hamming ≤ 3 pairs
  *                     via 4×16-bit band join (pigeonhole: ≤3 differing
  *                     bits leave ≥1 of 4 bands identical) — never O(n²).
  *   d04 exact ngram — inverted-index self-join on 8-byte gram hashes:
  *                     exact pair Jaccard without materializing non-
  *                     overlapping pairs. The correctness baseline for d02.
  *   d05 embedding   — cosine near-dup pairs with the codegen'd
  *                     CosineSimilarity kernel; banded LSH (v03) is the
  *                     scale path, exact all-pairs here is the oracle-
  *                     checkable baseline.
  *
  * All per-document text work (tokenize → gram → hash/signature) happens
  * in single-pass native expressions (TextHashExpressions.scala) — one
  * narrow map over the scan, no string shingles materialized, joins carry
  * 8-byte longs. The DuckDB oracles compute the same set relations from
  * string shingles; hash-vs-string equality holds modulo 2^-64 collisions.
  *
  * Reference surface being generalized: AnDB's DISTINCT / DuplicateRemoval
  * (andb/executor/operator/logical.py:298, physical/select.py:766) only
  * removes exact duplicate tuples; near-dup semantics are new capability.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  /** Shared DuckDB CTE computing exact pairwise Jaccard via an inverted
    * shingle index (the string-shingle mirror of the Spark plan shape). */
  private val oracleShingleJaccard: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |idx AS (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks WHERE len(w) >= 3),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sg FROM idx),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |          FROM sh a JOIN sh b ON a.sg = b.sg AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jacs AS (SELECT ia, ib, c * 1.0 / (sa.n + sb.n - c) AS jac
      |         FROM inter JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib)
      |""".stripMargin

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ---- d01: exact dedup by content hash -----------------------------
    // The corpus has no byte-identical texts, so the operator is shown on
    // a re-crawl-style input: base ∪ every 10th doc re-ingested under a
    // new id. One hash-groupBy, map-side combinable, O(n) at any scale.
    ("d01_dedup_exact",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val recrawl = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        base.union(recrawl)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))
          .filter(col("n_copies") > 1)
      },
      Some("""WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
              SELECT md5(text) AS content_hash, count(*) AS n_copies,
                     min(doc_id) AS keeper_id
              FROM corpus GROUP BY md5(text) HAVING count(*) > 1""")),

    // ---- d02: MinHash-LSH candidates + exact verify -------------------
    ("d02_dedup_minhash",
      (s, d) => {
        val bands = 8; val rows = 4
        // ONE codegen'd pass per doc: gram-hash set + 32-hash signature.
        val sh = Tables.documents(s, d).select(col("doc_id"),
          shingleHashSet(col("text")).as("hs"),
          minHashSignature(col("text"), 3, bands * rows).as("mh"))
        // 8 band buckets per doc; the gram set rides along so candidate
        // verification needs no join back to the corpus.
        val buckets = sh.select(col("doc_id"), col("hs"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              xxhash64(slice(col("mh"), b * rows + 1, rows)).as("sig"))): _*)).as("bs"))
          .select(col("doc_id"), col("hs"), col("bs.band").as("band"), col("bs.sig").as("sig"))
        val cands = buckets.as("a").join(buckets.as("b"),
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            col("a.hs").as("sha"), col("b.hs").as("shb"))
          .distinct()
        // Exact Jaccard verify on candidates only.
        cands
          .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
          .withColumn("jac", col("inter").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("inter")))
          .filter(col("jac") >= 0.9)
          .select(col("a_id"), col("b_id"), col("jac"))
      },
      // Oracle = exact all-pairs Jaccard ≥ 0.9 (LSH banding at 8×4 has
      // miss probability < 1e-8 per true pair at jac ≥ 0.95; the corpus'
      // planted dups sit at ≈ 0.98 with nothing between 0.2 and 0.9).
      Some(s"""WITH $oracleShingleJaccard
               SELECT ia AS a_id, ib AS b_id, jac FROM jacs WHERE jac >= 0.9""")),

    // ---- d03: SimHash hamming-≤k pairs (rows-only: signature internals
    // are engine-specific; validated against d04 in DedupSpec) -----------
    ("d03_dedup_simhash",
      (s, d) => {
        val sig = Tables.documents(s, d)
          .select(col("doc_id"), simHash64(col("text")).as("sig"))
        // Hamming ≤ 3 via 4×16-bit band join (pigeonhole guarantees a
        // shared band), then exact popcount filter.
        val banded = sig.select(col("doc_id"), col("sig"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("bs"))
          .select(col("doc_id"), col("sig"), col("bs.band"), col("bs.bv"))
        banded.as("a").join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 3)
      },
      None),

    // ---- d04: exact n-gram Jaccard scores (inverted index) ------------
    // Explode the 8-byte gram hashes once, self-join on the hash, count
    // co-occurrences; set sizes ride along so no join back to the corpus.
    ("d04_dedup_ngram",
      (s, d) => {
        val ex = Tables.documents(s, d)
          .select(col("doc_id"), shingleHashSet(col("text")).as("hs"))
          .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("h"))
        val a = ex.select(col("doc_id").as("a_id"), col("n").as("na"), col("h"))
        val b = ex.select(col("doc_id").as("b_id"), col("n").as("nb"), col("h"))
        a.join(b, a("h") === b("h") && col("a_id") < col("b_id"))
          .groupBy(col("a_id"), col("b_id"))
          .agg(count(lit(1)).as("c"), max(col("na")).as("na"), max(col("nb")).as("nb"))
          .withColumn("jac", col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .filter(col("jac") >= 0.2)
          .select(col("a_id"), col("b_id"), col("jac"))
      },
      Some(s"""WITH $oracleShingleJaccard
               SELECT ia AS a_id, ib AS b_id, jac FROM jacs WHERE jac >= 0.2""")),

    // ---- d06: duplicate-group resolution (keeper selection) -----------
    // Pairs are only half the dedup story: the pipeline needs GROUPS and
    // one keeper per group. Connected components over the jac ≥ 0.9 edge
    // set via min-label propagation: each iteration is one join + one
    // aggregate, converging in O(component diameter) rounds — near-dup
    // components are cliques/short chains, so 2-3 rounds in practice;
    // the loop exits on a fixpoint (scalar count check only, never data,
    // on the driver). Oracle: DuckDB recursive-CTE transitive closure.
    ("d06_dedup_groups",
      (s, d) => {
        val edges = defs.find(_._1 == "d04_dedup_ngram").get._2(s, d)
          .filter(col("jac") >= 0.9)
          .select(col("a_id"), col("b_id"))
          .localCheckpoint() // cut the lineage: the edge set is re-joined every round
        val sym = edges.union(edges.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        var labels = sym.groupBy(col("a_id"))
          .agg(min(col("b_id")).as("mn"))
          .select(col("a_id").as("doc_id"), least(col("a_id"), col("mn")).as("label"))
          .localCheckpoint()
        var changed = 1L
        var iter = 0
        while (changed > 0 && iter < 10) {
          val nbr = sym.join(labels, sym("b_id") === labels("doc_id"))
            .groupBy(col("a_id")).agg(min(col("label")).as("nbr_min"))
          val next = labels.join(nbr, labels("doc_id") === nbr("a_id"), "left")
            .select(col("doc_id"),
              least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
            .localCheckpoint()
          changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
            .filter(col("label") =!= col("old")).count()
          labels = next
          iter += 1
        }
        labels.groupBy(col("label").as("keeper_id"))
          .agg((count(lit(1))).as("group_size"),
               array_join(array_sort(collect_list(col("doc_id"))), ",").as("members"))
      },
      Some(s"""WITH RECURSIVE $oracleShingleJaccard,
               edges AS (SELECT ia AS a, ib AS b FROM jacs WHERE jac >= 0.9
                         UNION SELECT ib, ia FROM jacs WHERE jac >= 0.9),
               reach(a, b) AS (SELECT a, b FROM edges
                               UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
               comp AS (SELECT a AS doc_id, least(a, min(b)) AS keeper_id
                        FROM reach GROUP BY a)
               SELECT keeper_id, count(*) AS group_size,
                      array_to_string(list_sort(list(doc_id)), ',') AS members
               FROM comp GROUP BY keeper_id""")),

    // ---- d07: stratified sampling (per-language quotas) ----------------
    // The curation primitive between dedup and training: per-stratum
    // Bernoulli sampling is one map-side pass (no shuffle; the groupBy
    // here only summarizes the result). Sampling RNG is engine-specific
    // ⇒ rows-only; proportions are asserted in DedupSpec.
    ("d07_sample_stratified",
      (s, d) => {
        val fractions = Map("en" -> 0.5, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 0.25)
        Tables.documents(s, d)
          .stat.sampleBy("lang", fractions, seed = 7L)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
      },
      None),

    // ---- d08: benchmark contamination check ----------------------------
    // The decontamination op every LLM data pipeline runs: flag corpus
    // docs sharing any 5-gram with a benchmark set (stand-in: doc_id<5).
    // Benchmark gram set is small ⇒ broadcast hash join on 8-byte gram
    // hashes, map-side; at 100 TB this runs at scan speed with zero
    // shuffle of the corpus.
    ("d08_contamination",
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(col("doc_id"), explode(shingleHashSet(col("text"), 5)).as("h"))
        val bench = g.filter(col("doc_id") < 5)
          .select(col("h")).distinct()
        g.filter(col("doc_id") >= 5)
          .join(broadcast(bench), "h")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("h")).as("n_shared_grams"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              idx AS (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM toks WHERE len(w) >= 5),
              sh5 AS (SELECT DISTINCT doc_id,
                        w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS sg
                      FROM idx),
              bench AS (SELECT DISTINCT sg FROM sh5 WHERE doc_id < 5)
              SELECT s.doc_id, count(DISTINCT s.sg) AS n_shared_grams
              FROM sh5 s JOIN bench b ON s.sg = b.sg
              WHERE s.doc_id >= 5 GROUP BY s.doc_id""")),

    // ---- d05: embedding-cosine near-dup pairs -------------------------
    ("d05_dedup_embedding",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
        a.join(b, col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), cosine(col("ea"), col("eb")).as("cos_sim"))
          .filter(col("cos_sim") >= 0.45)
      },
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos_sim
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45"""))
  )
}
