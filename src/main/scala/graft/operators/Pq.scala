package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization model training + query-side lookup tables.
  *
  * PQ is the third rung of the ANN ladder (after banded LSH v03 and IVF
  * v05): the corpus is compressed to m 8-bit codes per vector — one LONG
  * column — and query scoring becomes m table lookups per row (ADC,
  * asymmetric distance computation) instead of a dim-length float loop.
  * At 100 TB this is the difference between scanning 256 bytes/vector and
  * 8 bytes/vector: the ADC pass is I/O-bound on a 32×-smaller column, and
  * composes with IVF partition pruning (encode once at write time next to
  * the cell assignment; probe = pruned directories × ADC scan × exact
  * re-rank of the top candidates only).
  *
  * Training follows the spark.ml/FAISS convention: codebooks are fit on a
  * BOUNDED deterministic sample that round-trips to the driver once (PQ
  * codebooks are m·ksub·subDim floats — model state, not data), per-
  * subspace Lloyd iterations run driver-side, and the corpus itself is
  * touched only by the single encode scan. Reference analog: AnDB's
  * vector search surface (andb/catalog/type.py:237) with a serial scan —
  * the codebook replaces the scan's full-precision reads.
  */
object Pq {

  /** Fit per-subspace codebooks. Sample = deterministic ~22% slice
    * (`vec_id % 37 < 8`, same as IVF training) capped at `sampleCap`
    * rows — at any corpus size the driver sees O(sampleCap·dim) floats.
    * Returns the flat codebook: entry ((j·ksub)+c)·subDim + t. */
  def train(e: DataFrame, m: Int, ksub: Int, iters: Int = 8,
      sampleCap: Int = 4096): Array[Float] = {
    val sample: Array[Array[Float]] = e.filter(col("vec_id") % 37 < 8)
      .orderBy(col("vec_id")).limit(sampleCap)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val books = new Array[Float](m * ksub * subDim)
    var j = 0
    while (j < m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      // Seeded from the sample itself (lowest vec_ids) — deterministic.
      var cents: Array[Array[Double]] =
        Array.tabulate(ksub)(c => sub(c % sub.length).map(_.toDouble))
      for (_ <- 1 to iters) {
        val sums = Array.fill(ksub)(new Array[Double](subDim))
        val counts = new Array[Long](ksub)
        for (v <- sub) {
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < ksub) {
            var dist = 0.0; var t = 0
            while (t < subDim) { val df = v(t) - cents(c)(t); dist += df * df; t += 1 }
            if (dist < bd) { bd = dist; best = c }
            c += 1
          }
          var t = 0
          while (t < subDim) { sums(best)(t) += v(t); t += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ksub)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      var c = 0
      while (c < ksub) {
        var t = 0
        while (t < subDim) {
          books((j * ksub + c) * subDim + t) = cents(c)(t).toFloat; t += 1
        }
        c += 1
      }
      j += 1
    }
    books
  }

  /** Query-side ADC tables: dot(q_j, centroid_{j,c}) and ‖centroid_{j,c}‖²
    * for every (subspace, code) — m·ksub doubles each, computed once per
    * query on the driver. */
  def luts(qv: Array[Float], books: Array[Float], m: Int, ksub: Int):
      (Array[Double], Array[Double]) = {
    require(m * ksub > 0 && books.length % (m * ksub) == 0, "codebook/m/ksub mismatch")
    val subDim = books.length / (m * ksub)
    require(qv.length == m * subDim,
      s"query dim ${qv.length} != codebook dim ${m * subDim}")
    val dotL = new Array[Double](m * ksub)
    val nrmL = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * subDim
        var dp = 0.0; var nn = 0.0; var t = 0
        while (t < subDim) {
          val bt = books(base + t).toDouble
          dp += qv(j * subDim + t).toDouble * bt
          nn += bt * bt
          t += 1
        }
        dotL(j * ksub + c) = dp; nrmL(j * ksub + c) = nn
        c += 1
      }
      j += 1
    }
    (dotL, nrmL)
  }
}
