package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.TextHash.{MinHashSignature, QualityFeaturesExpr, ShingleHashSet, SimHash64}
import org.apache.spark.sql.graft.VectorExpressions.{CosineSimilarity, CosineVsConstant, DotProduct, L2Norm}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** SparkSessionExtensions entry point — the analog of the reference's
  * optimizer/function-catalog seam (andb/sql/optimizer/transformations.py,
  * andb/catalog/function.py): SQL-callable vector functions plus a
  * logical-plan rewrite, injected without forking Spark.
  *
  * Enable with:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // programmatic, or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def fn(name: String, build: Seq[Expression] => Expression) =
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getCanonicalName, name),
        build)
    // Optional trailing INT-literal args (SQL: graft_shingles(t, 5)).
    def intArg(es: Seq[Expression], i: Int, default: Int): Int =
      if (es.length > i) es(i) match {
        case l: Literal => l.value match {
          case n: java.lang.Number => n.intValue()
          case v => throw new IllegalArgumentException(s"expected INT literal, got $v")
        }
        case e => throw new IllegalArgumentException(s"argument ${i + 1} must be a literal, got $e")
      } else default
    ext.injectFunction(fn("graft_cosine", es => CosineSimilarity(es(0), es(1))))
    ext.injectFunction(fn("graft_dot", es => DotProduct(es(0), es(1))))
    ext.injectFunction(fn("graft_l2norm", es => L2Norm(es(0))))
    // Text-hash kernels: n defaults to 3-grams, k to 32 hashes; both are
    // overridable per call so 5-gram surfaces (contamination, curation)
    // are SQL-expressible too.
    ext.injectFunction(fn("graft_shingles", es => ShingleHashSet(es(0), intArg(es, 1, 3))))
    ext.injectFunction(fn("graft_minhash", es => MinHashSignature(es(0), intArg(es, 1, 3), intArg(es, 2, 32))))
    ext.injectFunction(fn("graft_simhash", es => SimHash64(es(0), intArg(es, 1, 3))))
    // graft_quality(text[, array('stop', ...)[, normalize]]) → struct of
    // norm_text / n_words / n_distinct / n_stop (one pass per row).
    def strArrayArg(es: Seq[Expression], i: Int): Seq[String] =
      if (es.length > i) {
        require(es(i).foldable, s"argument ${i + 1} must be a foldable string array")
        es(i).eval(null) match {
          case a: ArrayData =>
            (0 until a.numElements()).map(j => a.getUTF8String(j).toString)
          case v => throw new IllegalArgumentException(s"expected ARRAY<STRING>, got $v")
        }
      } else Seq.empty
    def boolArg(es: Seq[Expression], i: Int, default: Boolean): Boolean =
      if (es.length > i) es(i) match {
        case Literal(b: Boolean, _) => b
        case e => throw new IllegalArgumentException(s"argument ${i + 1} must be a BOOLEAN literal, got $e")
      } else default
    ext.injectFunction(fn("graft_quality",
      es => QualityFeaturesExpr(es(0), strArrayArg(es, 1), boolArg(es, 2, default = true))))
    ext.injectOptimizerRule(_ => NormalizeConstantCosine)
    ext.injectOptimizerRule(_ => ThresholdedLevenshtein)
  }
}

/** Rewrites `cosine(x, <constant vector>)` to the fused
  * [[CosineVsConstant]] form: the constant's norm is computed ONCE at
  * optimization time, and each row runs a SINGLE loop accumulating
  * dot(x,c) and ‖x‖² together — ~2/3 of the generic kernel's per-row
  * float work, with no reliance on subexpression elimination (the
  * earlier dot/l2norm composition re-ran separate loops per occurrence
  * inside If branches and measured ~2.5× slower on the IVF argmax over
  * 16 constants). Semantics match CosineSimilarity exactly, including
  * zero-vector → 0.0 and length-mismatch → null.
  */
object NormalizeConstantCosine extends Rule[LogicalPlan] {

  private def constFloats(lit: Literal): Option[IndexedSeq[Float]] = lit.value match {
    case a: ArrayData => Some(a.toFloatArray().toIndexedSeq)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(x, c @ Literal(_, ArrayType(FloatType, _))) =>
      constFloats(c) match {
        case Some(vec) => CosineVsConstant(x, vec)
        case None      => CosineSimilarity(x, c)
      }
  }
}

/** Rewrites `levenshtein(a, b) <= k` (either orientation, `<` or `<=`,
  * integer-literal bound) to the BANDED form
  * `levenshtein(a, b, k) >= 0`: Spark's thresholded Levenshtein runs
  * the O(k·min(|a|,|b|)) diagonal band and returns −1 past the bound,
  * instead of filling the full O(|a|·|b|) DP matrix only to compare the
  * result once. On a dedup verify join (d11/d15's shape — millions of
  * candidate pairs, k ≪ doc length) that's the difference between the
  * edit-distance stage being the bottleneck and it being noise; the
  * engine's own operators already write the banded form by hand — this
  * rule gives a user's naive predicate the same plan (the reference's
  * optimizer-transformations analog,
  * andb/sql/optimizer/transformations.py). Semantics are identical:
  * distance ≤ k ⟺ banded result ≥ 0, NULL inputs stay NULL through
  * both forms, and `lev < k` lowers the band to k−1. Non-literal or
  * negative bounds are left untouched (a negative bound is a constant
  * FALSE the normal optimizer already handles). */
object ThresholdedLevenshtein extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{
    Cast, GreaterThan, GreaterThanOrEqual, Levenshtein, LessThan, LessThanOrEqual}
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  /** The un-thresholded distance, seen through any value-preserving
    * integral widening the comparison coercion may have inserted
    * (`lev(a,b) <= 6L` arrives as `Cast(lev, LongType) <= 6L`). Only a
    * WIDENING cast is matched — Int→Long cannot change the compared
    * value, so dropping it in the rewrite is exact; a narrowing cast
    * could, and stays untouched. */
  private object Lev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case c @ Cast(Levenshtein(a, b, None), LongType, _, _)
          if c.child.dataType == IntegerType => Some((a, b))
      case _ => None
    }
  }

  /** An integral-literal bound folded to Int: the coercion above also
    * types the bound as BIGINT/SMALLINT; any in-Int-range integral
    * literal is the same bound. Out-of-range Long bounds are left alone
    * (distance is Int-valued, so the predicate is constant anyway). */
  private object Bound {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(k: Int, IntegerType) => Some(k)
      case Literal(k: Long, LongType)
          if k >= Int.MinValue && k <= Int.MaxValue => Some(k.toInt)
      case Literal(k: Short, ShortType) => Some(k.toInt)
      case Literal(k: Byte, ByteType) => Some(k.toInt)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Lev(a, b), Bound(k)) if k >= 0 => banded(a, b, k)
    case LessThan(Lev(a, b), Bound(k)) if k >= 1 => banded(a, b, k - 1)
    case GreaterThanOrEqual(Bound(k), Lev(a, b)) if k >= 0 => banded(a, b, k)
    case GreaterThan(Bound(k), Lev(a, b)) if k >= 1 => banded(a, b, k - 1)
  }
}
