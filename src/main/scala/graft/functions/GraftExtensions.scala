package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native Catalyst functions.
  *
  * Install with `spark.sql.extensions=graft.functions.GraftExtensions`
  * (cluster-wide) — after which `graft_dot(a, b)` is available in SQL and
  * via `call_function`. The library degrades gracefully when the extension
  * is absent (see `Similarity.nativeDot`): the declarative higher-order
  * fallback computes identical values, just without codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Wrong-arity calls must fail ANALYSIS (clean `AnalysisException` with
    * the expected signature), not runtime `IndexOutOfBoundsException` from
    * an unchecked `children(i)` inside the builder. */
  private def arity(name: String, n: Int,
      build: Seq[Expression] => Expression)(
      children: Seq[Expression]): Expression = {
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    build(children)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      arity("graft_dot", 2, c => LongArrayDot(c.head, c(1))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[LongTopK].getName, "graft_topk"),
      arity("graft_topk", 2, c => LongTopK(c.head, c(1))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[LongBloomAgg].getName, "graft_bloom_agg"),
      arity("graft_bloom_agg", 3, c => LongBloomAgg(c.head, c(1), c(2))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_might_contain"),
      arity("graft_might_contain", 2, c => BloomMightContain(c.head, c(1))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_agg"),
      new ExpressionInfo(classOf[LongCmsAgg].getName, "graft_cms_agg"),
      arity("graft_cms_agg", 3, c => LongCmsAgg(c.head, c(1), c(2))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      arity("graft_cms_estimate", 2, c => CmsEstimate(c.head, c(1))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_dot"),
      new ExpressionInfo(classOf[CmsInnerProduct].getName, "graft_cms_dot"),
      arity("graft_cms_dot", 2, c => CmsInnerProduct(c.head, c(1))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_agg"),
      new ExpressionInfo(classOf[LongHllAgg].getName, "graft_hll_agg"),
      arity("graft_hll_agg", 2, c => LongHllAgg(c.head, c(1))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_merge"),
      new ExpressionInfo(classOf[HllMergeAgg].getName, "graft_hll_merge"),
      arity("graft_hll_merge", 1, c => HllMergeAgg(c.head)) _))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_estimate"),
      new ExpressionInfo(classOf[HllEstimate].getName, "graft_hll_estimate"),
      arity("graft_hll_estimate", 1, c => HllEstimate(c.head)) _))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      arity("graft_hilbert", 3, c => HilbertIndex(c.head, c(1), c(2))) _))
    ext.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[Tokenize].getName, "graft_tokens"),
      arity("graft_tokens", 1, c => Tokenize(c.head)) _))
    ext.injectFunction((
      FunctionIdentifier("graft_hll_registers"),
      new ExpressionInfo(classOf[HllRegisters].getName, "graft_hll_registers"),
      arity("graft_hll_registers", 1, c => HllRegisters(c.head)) _))
  }
}
