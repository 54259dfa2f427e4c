package graft

import graft.functions.CosineSimilarity
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
 *
 * For an already-running session (notebooks, tests) use
 * [[GraftExtensions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.cosineSimilarityFn)
}

object GraftExtensions {

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "cosine_similarity takes exactly 2 arguments")
    CosineSimilarity(exprs(0), exprs(1))
  }

  val cosineSimilarityFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    build _)

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build _, "scala_udf")
}
