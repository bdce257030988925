package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared banded-LSH plumbing.
  *
  * After a band-bucket self-join, a pair that collides in k of the L
  * bands appears k times. The usual fix — `distinct()` — shuffles every
  * candidate row once more. Instead, keep only the row whose band is the
  * FIRST matching band of the two signatures: band b matches iff its
  * bit-group in `sigA XOR sigB` is zero, so the minimal matching band is
  * a pure map-side expression over two longs that already ride the join.
  * Every true pair survives exactly once and an O(candidates) exchange
  * disappears from the pipeline — at 100 TB, the difference between an
  * LSH pass bounded by the band join and one bounded by a second
  * candidate-sized shuffle.
  */
object Lsh {

  /** Array of (band, bv) structs sliced from one signature column —
    * `explode(Lsh.bandStructs(sig, bits, n))` is the banded-table
    * builder shared by d03/d05/v03 (and the calibration sweep), so the
    * band slicing can never diverge between the production plans and the
    * parameter measurements they rest on. */
  def bandStructs(sig: Column, bandBits: Int, nBands: Int): Column = {
    val mask = (1L << bandBits) - 1
    array((0 until nBands).map(b =>
      struct(lit(b).as("band"),
        shiftright(sig, b * bandBits).bitwiseAND(lit(mask)).as("bv"))): _*)
  }

  /** Index of the lowest band whose `bandBits`-wide group is zero in
    * `xorSig` (-1 if none — impossible for rows emitted by a band-equality
    * join, where the matched band's group is zero by construction). */
  def firstMatchingBand(xorSig: Column, bandBits: Int, nBands: Int): Column = {
    val mask = (1L << bandBits) - 1
    (nBands - 1 to 0 by -1).foldLeft(lit(-1): Column)((acc, b) =>
      when(shiftright(xorSig, b * bandBits).bitwiseAND(lit(mask)) === 0, lit(b))
        .otherwise(acc))
  }

  /** Same idea for LSH schemes whose band signatures are HASHES (one long
    * per band, e.g. xxhash64 of a minhash-signature slice) rather than bit
    * groups of a single long: the lowest index at which the two band-sig
    * arrays agree (0-based; 0-row output if none, which a band-equality
    * join makes impossible). Pure map-side array compare over values that
    * already ride the join — the hashed-band twin of [[firstMatchingBand]],
    * closing the last candidate-sized `distinct()` in the LSH family. */
  def firstMatchingBandArrays(a: Column, b: Column): Column =
    (array_position(zip_with(a, b, (x, y) => x === y), true) - 1).cast("int")
}
