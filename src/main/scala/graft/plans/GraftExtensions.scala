package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, SortedIntersectCount}

/** SparkSessionExtensions registrar: exposes graft's native Catalyst
  * expressions to SQL. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * After registration: `SELECT dot_product(a.embedding, b.embedding)`
  * works in plain SQL alongside the Column API
  * (graft.functions.VectorExpressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "dot_product expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "sorted_intersect_count expects exactly 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
  }
}
