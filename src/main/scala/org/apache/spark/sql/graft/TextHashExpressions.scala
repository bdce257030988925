// Catalyst extension expressions live under org.apache.spark.sql (the
// same convention Sedona / spark-nlp use) because ExpectsInputTypes and
// the Column<->Expression bridge are private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge model: rank lookup keyed "left right" (space-joined — the
  * token alphabet is [a-z0-9], so the separator can't collide with
  * symbol content). Ships to executors once per plan as a codegen
  * reference object; the hash map rebuilds lazily after
  * deserialization. */
final class BpeModel(val merges: Array[String]) extends Serializable {
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), Integer.valueOf(i)); i += 1 }
    m
  }
}

/** Single-pass text→hash kernels: tokenize, build word n-gram shingles,
  * and reduce (distinct-hash set / MinHash signature / SimHash signature)
  * in ONE tight loop per row.
  *
  * Why expressions instead of `split`/`transform`/`concat_ws` HOF chains:
  * Catalyst re-inlines a big lambda pipeline into every Filter/Project
  * that references it (no cross-operator CSE, no CSE inside lambdas), so
  * the declarative version re-split the text hundreds of times per row —
  * measured 10-20× slower at sf0.1. Here each document is tokenized once,
  * each gram is hashed once (splitmix64 over word hashes — no gram string
  * is ever materialized), and the output is a primitive long[] that joins
  * and shuffles at 8 bytes per gram instead of ~25-byte strings. At 100 TB
  * the dedup shuffle volume drops ~3× and per-row CPU ~100×.
  *
  * Reference surface generalized: AnDB's DISTINCT / DuplicateRemoval
  * (andb/executor/operator/logical.py:298) — near-dup semantics are new.
  */
object TextHash {

  /** splitmix64 finalizer — deterministic, good avalanche. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic word hash (bytes of the UTF-8 slice, FNV-1a → mix). */
  @inline private def wordHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h = (h ^ bytes(i)) * 0x100000001B3L; i += 1 }
    mix(h)
  }

  /** Hashes of all word n-grams (with multiplicity, document order).
    * A gram hash chains the word hashes through mix, so equal grams hash
    * equal and different grams collide with p≈2^-64. Documents with fewer
    * than n words contribute one whole-text gram. */
  def gramHashes(s: UTF8String, n: Int): Array[Long] = {
    val bytes = s.getBytes
    // Word boundaries on ASCII space — one pass, no String allocation.
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val wh = new Array[Long](nWords)
    var w = 0; var start = 0; i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        wh(w) = wordHash(bytes, start, i); w += 1; start = i + 1
      }
      i += 1
    }
    if (nWords < n) {
      Array(wordHash(bytes, 0, bytes.length))
    } else {
      val out = new Array[Long](nWords - n + 1)
      var g = 0
      while (g < out.length) {
        var h = wh(g)
        var j = 1
        // Position-sensitive chain (multiply-then-xor): plain h ^ w would
        // make the first combine commutative, colliding swapped-word grams.
        while (j < n) { h = mix(h * 0x100000001B3L ^ wh(g + j)); j += 1 }
        out(g) = h
        g += 1
      }
      out
    }
  }

  /** Sorted distinct gram hashes — the shingle *set* (array_distinct
    * analog; sorted so array equality/intersection is well-defined). */
  def gramHashSet(s: UTF8String, n: Int): Array[Long] = {
    val a = gramHashes(s, n)
    java.util.Arrays.sort(a)
    var uniq = 0
    var i = 0
    while (i < a.length) {
      if (i == 0 || a(i) != a(i - 1)) { a(uniq) = a(i); uniq += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, uniq)
  }

  /** k-permutation MinHash signature over the gram set (duplicates cannot
    * change a min, so the multiset is fine): sig_i = min_g mix(g ^ seed_i). */
  def minHash(s: UTF8String, n: Int, k: Int): Array[Long] = {
    val grams = gramHashes(s, n)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = mix(i.toLong + 1)
      var m = Long.MaxValue
      var g = 0
      while (g < grams.length) {
        val h = mix(grams(g) ^ seed)
        if (h < m) m = h
        g += 1
      }
      sig(i) = m
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over the distinct gram set: bit b of each gram hash
    * votes ±1; signature bit b = sign of the tally. */
  def simHash(s: UTF8String, n: Int): Long = {
    val grams = gramHashSet(s, n)
    val votes = new Array[Int](64)
    var g = 0
    while (g < grams.length) {
      val h = grams(g)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      g += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** 28-bucket character histogram ('a'..'z', space, other) — the cheap
    * side of the edit-distance lower bound: one unit edit (insert /
    * delete / substitute) changes at most two bucket counts by one each,
    * so editDistance(a, b) >= L1(hist(a), hist(b)) / 2. A lossless
    * prefilter for bounded-edit-distance joins: L1 > 2k pairs can never
    * be within k edits, and the L1 loop is ~28 ops vs the O(k*len) DP.
    *
    * Counts CODE POINTS, not bytes: levenshtein edits characters, and a
    * byte histogram would move by up to the encoded length per edit (a
    * 'é' substitution shifts byte-L1 by 3), silently breaking the bound
    * for non-ASCII text. A UTF-8 lead byte advances past its
    * continuation bytes and contributes ONE count to the 'other'
    * bucket. */
  def charHistogram(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val h = new Array[Long](28)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') { h(b - 'a') += 1; i += 1 }
      else if (b == ' ') { h(26) += 1; i += 1 }
      else if ((b & 0x80) == 0) { h(27) += 1; i += 1 }
      else {
        // UTF-8 lead byte: 110xxxxx=2, 1110xxxx=3, 11110xxx=4 bytes;
        // malformed continuation bytes count singly (never skipped past
        // the end, never zero-advance).
        val len =
          if ((b & 0xE0) == 0xC0) 2
          else if ((b & 0xF0) == 0xE0) 3
          else if ((b & 0xF8) == 0xF0) 4
          else 1
        h(27) += 1
        i += math.min(len, bytes.length - i)
      }
    }
    h
  }

  /** One-pass repetition features (the Gopher/MassiveText-style signals
    * boilerplate filtering thresholds on): word hashes stream through two
    * small open-chained count maps — unigrams and position-chained
    * bigrams — and out come [n_words, n_distinct, top_word_count,
    * n_bigrams, top_bigram_count]. Declaratively this is
    * explode + two groupBy rounds (two corpus shuffles for a per-doc
    * statistic); here it is map-side, one pass, zero exchanges. Bigram
    * hash uses the SAME position-sensitive chain as gramHashes(n=2), so
    * spans hashing equal there count equal here. */
  def repetitionFeatures(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val wh = new Array[Long](nWords)
    var w = 0; var start = 0; i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        wh(w) = wordHash(bytes, start, i); w += 1; start = i + 1
      }
      i += 1
    }
    val uni = new java.util.HashMap[Long, Long](nWords * 2)
    var topWord = 0L
    i = 0
    while (i < nWords) {
      val c = uni.merge(wh(i), 1L, (a, b) => a + b)
      if (c > topWord) topWord = c
      i += 1
    }
    var topBigram = 0L
    val nBigrams = math.max(nWords - 1, 0)
    if (nBigrams > 0) {
      val bi = new java.util.HashMap[Long, Long](nBigrams * 2)
      i = 0
      while (i < nWords - 1) {
        val h = mix(wh(i) * 0x100000001B3L ^ wh(i + 1))
        val c = bi.merge(h, 1L, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    Array(nWords.toLong, uni.size.toLong, topWord, nBigrams.toLong, topBigram)
  }

  /** Single-pass normalize + quality features: builds the canonical text
    * (lowercase → strip non-[a-z0-9 ] → collapse space runs → trim) and
    * counts words, distinct words, and stop-word hits over it in ONE scan
    * of the bytes. Declaratively this is a regexp chain + split + two
    * array HOFs, which Catalyst re-inlines into every referencing
    * Filter/Project (measured 20-30× the work on the curation gate);
    * here the whole derivation is one expression, so a quality gate costs
    * one pass per row. ASCII semantics (bytes ≥ 0x80 are stripped like
    * any other non-[a-z0-9 ] char — matches the regex on this corpus).
    * Token contract matches `string_split(norm, ' ')`: an empty
    * normalized text still yields one empty token. With
    * `normalize = false` the counts run over the RAW text tokenized on
    * single spaces (empty tokens preserved, exactly like split/
    * string_split), for quality scoring of as-ingested text (t02). */
  def qualityFeatures(s: UTF8String, stopHashes: Array[Long],
      normalize: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var out = bytes
    var o = bytes.length
    if (normalize) {
      out = new Array[Byte](bytes.length)
      o = 0
      var lastSpace = true // leading spaces never emitted
      var i0 = 0
      while (i0 < bytes.length) {
        var b = bytes(i0)
        if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
          out(o) = b; o += 1; lastSpace = false
        } else if (b == ' ' && !lastSpace) {
          out(o) = ' '; o += 1; lastSpace = true
        }
        i0 += 1
      }
      if (o > 0 && out(o - 1) == ' ') o -= 1 // trim the single trailing space
    }
    var i = 0
    // Tokenize the normalized bytes: words = runs between single spaces.
    var nWords = 1L
    i = 0
    while (i < o) { if (out(i) == ' ') nWords += 1; i += 1 }
    val cap = java.lang.Long.highestOneBit(math.max(4L, nWords * 2 - 1)) << 1
    val seen = new Array[Long](cap.toInt) // open addressing; 0 = empty slot
    val capMask = cap.toInt - 1
    var nDistinct = 0L
    var nStop = 0L
    var start = 0
    i = 0
    while (i <= o) {
      if (i == o || out(i) == ' ') {
        var h = wordHash(out, start, i)
        if (h == 0) h = 1 // reserve 0 as the empty-slot marker
        var slot = (h & 0x7FFFFFFF).toInt & capMask
        while (seen(slot) != 0 && seen(slot) != h) slot = (slot + 1) & capMask
        if (seen(slot) == 0) { seen(slot) = h; nDistinct += 1 }
        var k = 0
        while (k < stopHashes.length) { if (stopHashes(k) == h) { nStop += 1; k = stopHashes.length } else k += 1 }
        start = i + 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromBytes(out, 0, o), nWords, nDistinct, nStop)
  }

  /** Greedy BPE application to ONE word: repeatedly merge the FIRST
    * occurrence of the lowest-rank adjacent pair until no adjacent pair
    * is in the model. One-occurrence-at-a-time is provably identical to
    * the textbook merge-all-occurrences form for TRAINED merge tables:
    * a rule involving a symbol created at rank r was necessarily learned
    * after r, so merging one occurrence can never surface a
    * lower-ranked pair than the one being merged. (The ScalaTest spec
    * pins this empirically against a merge-all reference.) Returns the
    * piece count. */
  def bpePieces(word: String, model: BpeModel): Int = {
    if (word.length <= 1) return word.length
    val syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Integer.MAX_VALUE
      var bestIdx = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = model.ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms.set(bestIdx, syms.get(bestIdx) + syms.get(bestIdx + 1))
        syms.remove(bestIdx + 1)
      }
    }
    syms.size
  }

  /** BPE token count of a text: sum of [[bpePieces]] over the text's
    * [a-z0-9]+ runs — the same word tokenization as t03/t17's
    * regexp_extract_all word counter, scanned in one pass. */
  def bpeTokenCount(s: UTF8String, model: BpeModel): Long = {
    val str = s.toString
    var total = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < n && {
          val d = str.charAt(j); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) j += 1
        total += bpePieces(str.substring(i, j), model)
        i = j
      } else i += 1
    }
    total
  }

  /** Shannon entropy in bits per character over Unicode code points —
    * the encoded-junk detector (base64 blobs, hex dumps and compressed
    * payloads sit far from natural text's ~4 bits/char). One pass to
    * count, then the Σ −p·log₂p sum in ASCENDING code-point order
    * (TreeMap) so the float result is deterministic per input; the
    * cross-engine comparison still grids (DuckDB sums in group-hash
    * order and its log2 is a different libm path — both land inside a
    * 1e-6 grid cell for entropies in [0, 21)). Empty text → 0.0. */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    val ln2 = math.log(2.0)
    var e = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      e -= p * (math.log(p) / ln2)
    }
    e
  }

  /** Hash a stop-word list the way [[qualityFeatures]] hashes tokens. */
  def stopWordHashes(stop: Seq[String]): Array[Long] =
    stop.map { w =>
      val b = w.getBytes("UTF-8")
      val h = wordHash(b, 0, b.length)
      if (h == 0) 1L else h
    }.toArray

  // ---- Expressions ----------------------------------------------------

  private val LongArray = ArrayType(LongType, containsNull = false)

  abstract class TextHashExpr extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    /** Java call (around the bound string variable) for codegen. */
    protected def call(x: String): String
    protected def wrap(r: String): String = r
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => s"${ev.value} = ${wrap(call(x))};")
  }

  abstract class LongArrayExpr extends TextHashExpr {
    override def dataType: DataType = LongArray
    override protected def wrap(r: String): String =
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($r)"
  }

  /** Sorted distinct word-n-gram hash set. */
  case class ShingleHashSet(child: Expression, n: Int) extends LongArrayExpr {
    override def prettyName: String = "graft_shingle_hashes"
    override protected def nullSafeEval(a: Any): Any =
      UnsafeArrayData.fromPrimitiveArray(gramHashSet(a.asInstanceOf[UTF8String], n))
    override protected def call(x: String): String =
      s"org.apache.spark.sql.graft.TextHash.gramHashSet($x, $n)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** POSITIONAL word-n-gram hashes — one entry per gram occurrence, in
    * document order (multiplicity preserved, unlike ShingleHashSet).
    * This is the substring-dedup view: position p duplicated ⟺ the gram
    * starting at p occurs elsewhere in the corpus. */
  case class GramHashList(child: Expression, n: Int) extends LongArrayExpr {
    override def prettyName: String = "graft_gram_hash_list"
    override protected def nullSafeEval(a: Any): Any =
      UnsafeArrayData.fromPrimitiveArray(gramHashes(a.asInstanceOf[UTF8String], n))
    override protected def call(x: String): String =
      s"org.apache.spark.sql.graft.TextHash.gramHashes($x, $n)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 28-bucket character histogram (see [[charHistogram]]). */
  case class CharHistogram(child: Expression) extends LongArrayExpr {
    override def prettyName: String = "graft_char_histogram"
    override protected def nullSafeEval(a: Any): Any =
      UnsafeArrayData.fromPrimitiveArray(charHistogram(a.asInstanceOf[UTF8String]))
    override protected def call(x: String): String =
      s"org.apache.spark.sql.graft.TextHash.charHistogram($x)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** L1 distance between equal-length long arrays — codegen'd tight loop
    * (the HOF zip_with/aggregate form is interpreted per element).
    * Length mismatch → null. */
  case class L1LongDistance(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongArray, LongArray)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_l1_long"
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var s = 0L; var i = 0
        while (i < n) { s += math.abs(x.getLong(i) - y.getLong(i)); i += 1 }
        s
      }
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
          int $n = $x.numElements();
          if ($n != $y.numElements()) {
            ${ev.isNull} = true;
          } else {
            long $s = 0L;
            for (int $i = 0; $i < $n; $i++) {
              $s += java.lang.Math.abs($x.getLong($i) - $y.getLong($i));
            }
            ${ev.value} = $s;
          }
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** [n_words, n_distinct, top_word_count, n_bigrams, top_bigram_count]. */
  case class RepetitionFeatures(child: Expression) extends LongArrayExpr {
    override def prettyName: String = "graft_repetition_features"
    override protected def nullSafeEval(a: Any): Any =
      UnsafeArrayData.fromPrimitiveArray(repetitionFeatures(a.asInstanceOf[UTF8String]))
    override protected def call(x: String): String =
      s"org.apache.spark.sql.graft.TextHash.repetitionFeatures($x)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** k-hash MinHash signature. */
  case class MinHashSignature(child: Expression, n: Int, k: Int) extends LongArrayExpr {
    override def prettyName: String = "graft_minhash"
    override protected def nullSafeEval(a: Any): Any =
      UnsafeArrayData.fromPrimitiveArray(minHash(a.asInstanceOf[UTF8String], n, k))
    override protected def call(x: String): String =
      s"org.apache.spark.sql.graft.TextHash.minHash($x, $n, $k)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Normalize + word/distinct/stop-word counts as ONE struct-valued
    * expression (see [[TextHash.qualityFeatures]]). */
  case class QualityFeaturesExpr(child: Expression, stop: Seq[String],
      normalize: Boolean = true)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("norm_text", StringType, nullable = false),
      StructField("n_words", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("n_stop", LongType, nullable = false)))
    override def prettyName: String = "graft_quality_features"

    @transient private lazy val stopH: Array[Long] = stopWordHashes(stop)

    override protected def nullSafeEval(a: Any): Any =
      qualityFeatures(a.asInstanceOf[UTF8String], stopH, normalize)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val ref = ctx.addReferenceObj("stopHashes", stopH, "long[]")
        s"${ev.value} = org.apache.spark.sql.graft.TextHash.qualityFeatures($x, $ref, $normalize);"
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** BPE token count under a fixed merge table (see
    * [[TextHash.bpeTokenCount]]) — classifier/packing budgets key off
    * this at scan speed; the model rides as one reference object, never
    * per-row state. */
  case class BpeTokenCountExpr(child: Expression, merges: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_tokens"

    @transient private lazy val model = new BpeModel(merges.toArray)

    override protected def nullSafeEval(a: Any): Any =
      bpeTokenCount(a.asInstanceOf[UTF8String], model)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val ref = ctx.addReferenceObj("bpeModel", model,
          classOf[org.apache.spark.sql.graft.BpeModel].getName)
        s"${ev.value} = org.apache.spark.sql.graft.TextHash.bpeTokenCount($x, $ref);"
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Code-point Shannon entropy (bits/char) — see [[TextHash.charEntropy]]. */
  case class CharEntropyExpr(child: Expression) extends TextHashExpr {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_char_entropy"
    override protected def nullSafeEval(a: Any): Any =
      charEntropy(a.asInstanceOf[UTF8String])
    override protected def call(x: String): String =
      s"org.apache.spark.sql.graft.TextHash.charEntropy($x)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash signature. */
  case class SimHash64(child: Expression, n: Int) extends TextHashExpr {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"
    override protected def nullSafeEval(a: Any): Any =
      simHash(a.asInstanceOf[UTF8String], n)
    override protected def call(x: String): String =
      s"org.apache.spark.sql.graft.TextHash.simHash($x, $n)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column API -----------------------------------------------------
  private def mk(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)

  def shingleHashSet(c: Column, n: Int = 3): Column = mk(ShingleHashSet(ex(c), n))
  def gramHashList(c: Column, n: Int = 3): Column = mk(GramHashList(ex(c), n))
  def repetitionFeaturesCol(c: Column): Column = mk(RepetitionFeatures(ex(c)))
  def charHistogramCol(c: Column): Column = mk(CharHistogram(ex(c)))
  def l1Long(a: Column, b: Column): Column = mk(L1LongDistance(ex(a), ex(b)))
  def minHashSignature(c: Column, n: Int = 3, k: Int = 32): Column = mk(MinHashSignature(ex(c), n, k))
  def simHash64(c: Column, n: Int = 3): Column = mk(SimHash64(ex(c), n))
  def qualityFeaturesCol(c: Column, stop: Seq[String], normalize: Boolean = true): Column =
    mk(QualityFeaturesExpr(ex(c), stop, normalize))
  def bpeTokenCountCol(c: Column, merges: Seq[String]): Column =
    mk(BpeTokenCountExpr(ex(c), merges))
  def charEntropyCol(c: Column): Column = mk(CharEntropyExpr(ex(c)))
}
