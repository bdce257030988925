// Lives under org.apache.spark.sql because the Column<->Expression
// bridge is private[sql] in Spark 4 (same convention as
// VectorExpressions / TextHashExpressions).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over Spark's own sketch BloomFilter as a native
  * codegen'd Expression — the membership-prefilter primitive for
  * decontamination-class pipelines.
  *
  * Why: an exact distinct-key set costs ~30+ bytes/key to broadcast
  * (8-byte hash + set overhead); a Bloom filter at 1% fpp costs ~1.2
  * bytes/key — the difference between "cannot broadcast a billion bench
  * grams" and "ships in the task binary". Bloom filters have NO false
  * negatives, so using one as a PREFILTER in front of an exact join
  * keeps results exact: true matches always pass, false positives die
  * in the exact join, and the joined volume drops to
  * matches + fpp·corpus.
  *
  * The deserialized filter is attached to the generated code as a
  * reference object (one instance per executor JVM, shared by all
  * tasks), and the probe compiles to a single virtual call inside
  * whole-stage codegen.
  *
  * Reference analog: AnDB's semantic/boolean filter operators
  * (andb/executor/operator/physical/select.py Filter) — exact only; a
  * sketch-backed prefilter is the piece its design lacks at scale.
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  // Array[Byte] compares by reference under case-class equality, which
  // would make semantically identical probes never semanticEquals —
  // defeating subexpression elimination and exchange reuse. Compare the
  // bytes structurally (hash cached; equals short-circuits on it).
  @transient private lazy val bytesHash: Int = java.util.Arrays.hashCode(filterBytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash
  override def equals(o: Any): Boolean = o match {
    case b: BloomMightContainLong =>
      child == b.child && bytesHash == b.bytesHash &&
        java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomExpressions {

  // One serialization per filter instance, not per expression built from
  // it (an O(filter-size) copy each time otherwise). Weak keys: the memo
  // never outlives the filter.
  private val serialized =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[BloomFilter, Array[Byte]]())

  /** Serialize a built filter once for plan embedding. */
  def serialize(bf: BloomFilter): Array[Byte] =
    serialized.computeIfAbsent(bf, { b =>
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    })

  /** `mightContainLong(col, bf)` — true iff the long-valued column may be
    * in the filter (exact-join afterwards for exactness). */
  def mightContainLong(c: Column, bf: BloomFilter): Column =
    ExpressionUtils.column(
      BloomMightContainLong(ExpressionUtils.expression(c), serialize(bf)))
}
