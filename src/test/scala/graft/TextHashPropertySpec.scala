package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.TextHash

/** Property-style tests pinning the single-pass TextHash kernels to a
  * naive reference implementation (split/sliding/distinct over Strings) —
  * the semantics the DuckDB oracles assume. Cases: 200 seeded random docs
  * plus adversarial boundaries (empty, double spaces, repeats, unicode). */
class TextHashPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("a", "bb", "ccc", "word", "key", "zz", "é", "中文")
  private def randomDoc(): String =
    Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private val cases: Seq[String] =
    Seq("", " ", "a  b   c", "x x x x x", "é ü 中文 word", "one", "one two") ++
      Seq.fill(200)(randomDoc())

  private def naiveGramCount(text: String, n: Int): Int = {
    val w = text.split(" ", -1).toSeq
    val grams = if (w.length < n) Seq(text) else w.sliding(n).map(_.mkString(" ")).toSeq
    grams.distinct.size
  }

  test("gramHashSet size equals naive distinct n-gram count") {
    for (text <- cases; n <- 2 to 4) {
      val got = TextHash.gramHashSet(UTF8String.fromString(text), n).length
      assert(got == naiveGramCount(text, n), s"text=[$text] n=$n")
    }
  }

  test("gramHashSet is sorted, distinct, and deterministic") {
    for (text <- cases) {
      val a = TextHash.gramHashSet(UTF8String.fromString(text), 3)
      val b = TextHash.gramHashSet(UTF8String.fromString(text), 3)
      assert(a.toSeq == b.toSeq)
      assert(a.toSeq == a.toSeq.sorted)
      assert(a.toSeq.distinct == a.toSeq)
    }
  }

  test("distinct grams hash distinctly across the whole corpus") {
    // Global collision check over every distinct string gram generated
    // above — hash equality must track string equality.
    val seen = scala.collection.mutable.Map[Long, String]()
    for (text <- cases) {
      val w = text.split(" ", -1).toSeq
      val grams = if (w.length < 3) Seq(text) else w.sliding(3).map(_.mkString(" ")).toSeq
      val hashes = TextHash.gramHashes(UTF8String.fromString(text), 3)
      grams.zip(hashes).foreach { case (g, h) =>
        seen.get(h).foreach(prev => assert(prev == g, s"collision: [$prev] vs [$g]"))
        seen(h) = g
      }
    }
  }

  test("char-histogram L1/2 never exceeds true edit distance (lossless bound)") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    def l1(a: String, b: String): Long = {
      val ha = TextHash.charHistogram(UTF8String.fromString(a))
      val hb = TextHash.charHistogram(UTF8String.fromString(b))
      ha.zip(hb).map { case (x, y) => math.abs(x - y) }.sum
    }
    val rnd = new scala.util.Random(7)
    // Non-ASCII chars included: the histogram must count CODE POINTS
    // (one 'é'→'a' substitution is ONE edit), or multi-byte encodings
    // inflate L1 past 2·ed and the "lossless" prefilter drops true pairs.
    for (alpha <- Seq("abcdef g", "abé☃ g")) {
      def randStr(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      for (_ <- 1 to 300) {
        val a = randStr(rnd.nextInt(40))
        // Mix of independent strings and mutated copies (the near-dup case).
        val b = if (rnd.nextBoolean()) randStr(rnd.nextInt(40))
          else a.map(c => if (rnd.nextInt(10) == 0) alpha(rnd.nextInt(alpha.length)) else c)
        val bound = (l1(a, b) + 1) / 2
        assert(bound <= lev(a, b), s"[$a] vs [$b]: L1/2=$bound > ed=${lev(a, b)}")
      }
    }
  }

  test("repetitionFeatures matches the naive count-map reference") {
    def naive(text: String): Array[Long] = {
      val ws = text.split(" ", -1)
      val uni = ws.groupBy(identity).view.mapValues(_.length.toLong)
      val bi = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        .groupBy(identity).view.mapValues(_.length.toLong)
      Array(ws.length.toLong, uni.size.toLong, uni.values.max,
        math.max(ws.length - 1, 0).toLong,
        if (bi.isEmpty) 0L else bi.values.max)
    }
    // Planted extremes + edge shapes (empty words via double spaces).
    val cases = Seq("a b a b a", "x x x x", "solo",
      "nav home nav home nav home about", "a  b", " lead", "trail ",
      "the quick brown fox jumps over the lazy dog the quick brown fox")
    for (t <- cases) {
      val got = TextHash.repetitionFeatures(UTF8String.fromString(t))
      assert(got.toSeq == naive(t).toSeq, s"[$t]: ${got.toSeq} vs ${naive(t).toSeq}")
    }
    // Hand-checked anchor: "a b a b a" = 5 words, 2 distinct, 'a'×3,
    // 4 bigrams, top bigram ("a b") ×2.
    assert(TextHash.repetitionFeatures(UTF8String.fromString("a b a b a")).toSeq
      == Seq(5L, 2L, 3L, 4L, 2L))
  }

  test("qualityFeatures matches the naive normalize+split reference") {
    val stop = Seq("a", "key", "zz")
    val stopH = TextHash.stopWordHashes(stop)
    for (text <- cases) {
      val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .replaceAll(" +", " ").trim
      val w = norm.split(" ", -1).toSeq
      val row = TextHash.qualityFeatures(UTF8String.fromString(text), stopH, normalize = true)
      assert(row.getUTF8String(0).toString == norm, s"norm of [$text]")
      assert(row.getLong(1) == w.length, s"n_words of [$text]")
      assert(row.getLong(2) == w.distinct.length, s"n_distinct of [$text]")
      assert(row.getLong(3) == w.count(stop.contains), s"n_stop of [$text]")
      // Raw mode: counts over the as-ingested tokens (split on ' ').
      val wr = text.split(" ", -1).toSeq
      val raw = TextHash.qualityFeatures(UTF8String.fromString(text), stopH, normalize = false)
      assert(raw.getLong(1) == wr.length, s"raw n_words of [$text]")
      assert(raw.getLong(2) == wr.distinct.length, s"raw n_distinct of [$text]")
      assert(raw.getLong(3) == wr.count(stop.contains), s"raw n_stop of [$text]")
    }
  }

  test("equal docs share all minhashes; disjoint docs share almost none") {
    val u1 = UTF8String.fromString("alpha beta gamma delta epsilon zeta eta theta")
    val u2 = UTF8String.fromString("one two three four five six seven eight nine")
    val m1 = TextHash.minHash(u1, 3, 32)
    val m1b = TextHash.minHash(u1, 3, 32)
    val m2 = TextHash.minHash(u2, 3, 32)
    assert(m1.toSeq == m1b.toSeq)
    assert(m1.zip(m2).count { case (a, b) => a == b } <= 2)
  }

  test("simhash of identical docs is identical; hamming grows with edits") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tonight")
    val far = "completely different words in every single position here now ok"
    def sig(s: String) = TextHash.simHash(UTF8String.fromString(s), 3)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sig(base) == sig(base))
    assert(ham(sig(base), sig(near)) < ham(sig(base), sig(far)),
      s"near=${ham(sig(base), sig(near))} far=${ham(sig(base), sig(far))}")
  }

  // ---- BPE (t17) ------------------------------------------------------

  /** Textbook reference application: repeatedly find the lowest-rank
    * adjacent pair present and merge ALL its left-to-right
    * non-overlapping occurrences — the variant whose equivalence to the
    * kernel's one-occurrence-at-a-time loop bpePieces claims. */
  private def referenceBpe(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    var done = false
    while (!done && syms.length > 1) {
      val present = syms.zip(syms.tail).filter(ranks.contains)
      if (present.isEmpty) done = true
      else {
        val best = present.minBy(ranks)
        syms = graft.operators.Bpe.mergeAll(syms.toArray, best).toSeq
      }
    }
    syms
  }

  test("bpePieces equals the merge-all-occurrences reference on trained tables") {
    // Train on a tiny corpus via the real trainer, then compare
    // application on every word plus adversarial shapes (overlapping
    // repeats like aaaa, unseen words, single chars).
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      "the theme of the thesis is the theory",
      "and another and then and again and so on",
      "aaaa aaa aa a abab ababab",
      "tokenize tokenizer tokenization token tokens")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = graft.operators.Bpe.train(docs, numMerges = 40, vocabCap = 1000)
    assert(merges.nonEmpty)
    val ranks = merges.zipWithIndex.toMap
    val model = new org.apache.spark.sql.graft.BpeModel(
      merges.map { case (l, r) => s"$l $r" }.toArray)
    val words = ("unseenword" +: "xyz" +: "a" +: "aaaaaaa" +: docs.collect()
      .flatMap(_.getString(1).split(" ")).toSeq.distinct.toList).distinct
    for (w <- words) {
      val ref = referenceBpe(w, ranks)
      val got = TextHash.bpePieces(w, model)
      assert(got == ref.length, s"word=[$w] ref=$ref got=$got")
    }
  }

  test("BPE training is deterministic and matches hand-computed merges") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Corpus engineered so the first merges are unambiguous: "ab" occurs
    // most, then ("ab","c") from abc.
    val docs = Seq("abc abc abc ab ab abd", "abc ab zq zq")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m1 = graft.operators.Bpe.train(docs, numMerges = 3, vocabCap = 100)
    val m2 = graft.operators.Bpe.train(docs, numMerges = 3, vocabCap = 100)
    assert(m1 == m2, "training must be byte-identical across runs")
    // pair counts: (a,b): abc×4 + ab×3 + abd×1 = 8; (b,c): 4; (z,q): 2
    assert(m1.head == ("a", "b"), s"got $m1")
    assert(m1(1) == ("ab", "c"), s"got $m1")
  }

  test("charEntropy: closed forms, determinism, and junk separation") {
    import org.apache.spark.unsafe.types.UTF8String
    def e(s: String) = TextHash.charEntropy(UTF8String.fromString(s))
    // Single repeated char: zero bits.
    assert(e("aaaaaaaa") == 0.0)
    assert(e("") == 0.0)
    // Uniform k-distinct-char string: exactly log2 k (p = 1/k is a
    // power of two here, so the float math is exact).
    assert(math.abs(e("abcd") - 2.0) < 1e-12)
    assert(math.abs(e("abcdefgh") - 3.0) < 1e-12)
    // Deterministic across calls and under char-order permutation of
    // the same multiset (the TreeMap ascending sum order).
    assert(e("hello world") == e("hello world"))
    assert(e("dcba") == e("abcd"))
    // The operating band: natural-ish text sits WELL above repeated
    // padding and below full-random base64-ish strings' ceiling.
    val natural = e("the quick brown fox jumps over the lazy dog")
    val padding = e("xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx")
    assert(natural > 3.0 && padding < 1.0)
    // Surrogate pairs: counted per code POINT, not per UTF-16 char —
    // two distinct astral chars, uniform → exactly 1 bit.
    assert(math.abs(e("😀😁") - 1.0) < 1e-12)
  }
}
