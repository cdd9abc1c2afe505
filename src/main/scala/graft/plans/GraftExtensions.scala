package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes graft's native functions
  * available in pure-SQL deployments without touching application code:
  *
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  *
  * (The programmatic path is `HammingDistance.register(spark)`; this is
  * the cluster-wide registration hook.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming64"),
      { exprs => {
        require(exprs.length == 2, "hamming64 takes exactly 2 arguments")
        HammingDistance(exprs.head, exprs(1))
      } }))
    e.injectFunction((
      FunctionIdentifier("dotf"),
      new ExpressionInfo(classOf[DotProductF].getName, "dotf"),
      { exprs => {
        require(exprs.length == 2, "dotf takes exactly 2 arguments")
        DotProductF(exprs.head, exprs(1))
      } }))
    e.injectFunction((
      FunctionIdentifier("doti"),
      new ExpressionInfo(classOf[DotProductL].getName, "doti"),
      { exprs => {
        require(exprs.length == 2, "doti takes exactly 2 arguments")
        DotProductL(exprs.head, exprs(1))
      } }))
    e.injectFunction((
      FunctionIdentifier("l1i"),
      new ExpressionInfo(classOf[L1DistanceI].getName, "l1i"),
      { exprs => {
        require(exprs.length == 2, "l1i takes exactly 2 arguments")
        L1DistanceI(exprs.head, exprs(1))
      } }))
    e.injectFunction((
      FunctionIdentifier("interlen"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "interlen"),
      SortedIntersectCount.build _))
    e.injectFunction((
      FunctionIdentifier("winnowfp"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnowfp"),
      WinnowFingerprints.build _))
    e.injectFunction((
      FunctionIdentifier("maxfreq"),
      new ExpressionInfo(classOf[MaxFreqL].getName, "maxfreq"),
      { exprs => {
        require(exprs.length == 1, "maxfreq takes exactly 1 argument")
        MaxFreqL(exprs.head)
      } }))
    // window-top-k → bounded-heap custom operator (rule + strategy pair)
    e.injectOptimizerRule(_ => RewriteWindowTopK)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
