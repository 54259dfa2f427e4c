package graft

import graft.functions.{CosineSimilarity, SimHash60, SortedContains}
import graft.plans.ApproxPercentileRewrite
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: makes the engine's native expressions
 * available to pure-SQL users.
 *
 *   SparkSession.builder().withExtensions(new GraftExtensions) ...
 *   // or spark.sql.extensions=graft.GraftExtensions on a cluster
 *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
 *   spark.sql("SELECT simhash60(word_hashes) ...")
 *
 * For an already-running session (notebooks, tests) use
 * [[GraftExtensions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimilarityFn)
    e.injectFunction(GraftExtensions.simhash60Fn)
    e.injectFunction(GraftExtensions.sortedContainsFn)
    e.injectOptimizerRule(_ => ApproxPercentileRewrite)
  }
}

object GraftExtensions {

  private def buildCosine(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "cosine_similarity takes exactly 2 arguments")
    CosineSimilarity(exprs(0), exprs(1))
  }

  private def buildSimhash(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash60 takes exactly 1 argument")
    SimHash60(exprs(0))
  }

  private def buildSortedContains(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "sorted_contains takes exactly 2 arguments")
    SortedContains(exprs(0), exprs(1))
  }

  val cosineSimilarityFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    buildCosine _)

  val simhash60Fn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash60"),
    new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
    buildSimhash _)

  val sortedContainsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_contains"),
    new ExpressionInfo(classOf[SortedContains].getName, "sorted_contains"),
    buildSortedContains _)

  /** Runtime registration on an existing session (functions via the
    * registry, the optimizer rule via `experimental.extraOptimizations` —
    * the rule itself stays inert until its SQLConf flag is set). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", buildCosine _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", buildSimhash _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_contains", buildSortedContains _, "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(ApproxPercentileRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxPercentileRewrite
  }
}
