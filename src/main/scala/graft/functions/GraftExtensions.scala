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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      (children: Seq[Expression]) => LongArrayDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[LongTopK].getName, "graft_topk"),
      (children: Seq[Expression]) => LongTopK(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[LongBloomAgg].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        LongBloomAgg(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_agg"),
      new ExpressionInfo(classOf[LongCmsAgg].getName, "graft_cms_agg"),
      (children: Seq[Expression]) =>
        LongCmsAgg(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children.head, children(1))))
  }
}
