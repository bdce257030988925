package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, EqualTo, Expression, ExpressionInfo, If, Literal, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.TextHash.{MinHashSignature, ShingleHashSet, SimHash64}
import org.apache.spark.sql.graft.VectorExpressions.{CosineSimilarity, DotProduct, L2Norm}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

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
    ext.injectFunction(fn("graft_cosine", es => CosineSimilarity(es(0), es(1))))
    ext.injectFunction(fn("graft_dot", es => DotProduct(es(0), es(1))))
    ext.injectFunction(fn("graft_l2norm", es => L2Norm(es(0))))
    // Text-hash kernels: n defaults to 3-grams, k to 32 hashes.
    ext.injectFunction(fn("graft_shingles", es => ShingleHashSet(es(0), 3)))
    ext.injectFunction(fn("graft_minhash", es => MinHashSignature(es(0), 3, 32)))
    ext.injectFunction(fn("graft_simhash", es => SimHash64(es(0), 3)))
    ext.injectOptimizerRule(_ => NormalizeConstantCosine)
  }
}

/** Rewrites `cosine(x, <constant vector>)` so the constant's norm is
  * computed ONCE at optimization time instead of per row:
  *
  *   cosine(x, c)  →  if (size(x) ≠ |c|)      null
  *                    else if (l2norm(x) = 0) 0.0
  *                    else dot(x, c) / (l2norm(x) * ‖c‖)
  *
  * with ‖c‖ folded to a double literal here. Catalyst's subexpression
  * elimination shares the two l2norm(x) occurrences. For a scan-heavy KNN
  * query (cosine against one query vector) this halves the per-row float
  * loop work: one fused dot+norm pass over x instead of dot+norm(x)+
  * norm(c). Semantics match CosineSimilarity exactly, including the
  * zero-vector → 0.0 and length-mismatch → null conventions (the size
  * guard is what keeps the rewrite correct when a row's vector length
  * differs from the constant's — norms would otherwise silently span
  * different element counts than the min-length dot).
  */
object NormalizeConstantCosine extends Rule[LogicalPlan] {

  private def constLenNorm(lit: Literal): Option[(Int, Double)] = lit.value match {
    case a: ArrayData =>
      var s = 0.0
      var i = 0
      while (i < a.numElements()) {
        val v = a.getFloat(i).toDouble; s += v * v; i += 1
      }
      Some((a.numElements(), math.sqrt(s)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(x, c @ Literal(_, ArrayType(FloatType, _))) =>
      constLenNorm(c) match {
        case Some((len, norm)) =>
          val body =
            if (norm == 0.0) Literal(0.0, DoubleType)
            else If(EqualTo(L2Norm(x), Literal(0.0, DoubleType)),
              Literal(0.0, DoubleType),
              Divide(DotProduct(x, c), Multiply(L2Norm(x), Literal(norm, DoubleType))))
          If(EqualTo(Size(x, legacySizeOfNull = false), Literal(len)),
            body, Literal(null, DoubleType))
        case None => CosineSimilarity(x, c)
      }
  }
}
