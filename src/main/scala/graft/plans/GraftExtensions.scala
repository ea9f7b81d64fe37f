package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** SparkSessionExtensions registration for graft's native expressions
  * (SURVEY.md §2 #35). Activate with either:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * after which `graft_cosine(a, b)` is available in SQL and via
  * `call_function("graft_cosine", ...)` in the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(a, b) takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
