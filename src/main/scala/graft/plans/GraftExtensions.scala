package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, SortedIntersectCount, TopKByValue}

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
    // aggregate expressions register the same way — the analyzer
    // wraps a declared AggregateFunction in AggregateExpression when
    // it appears in an aggregation context:
    //   SELECT g, topk_by_value(v, id, 3) FROM t GROUP BY g
    e.injectFunction((
      new FunctionIdentifier("topk_by_value"),
      new ExpressionInfo(classOf[TopKByValue].getName, "topk_by_value"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "topk_by_value expects (value, id, k)")
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_value k must be an integer literal, got $other")
        }
        require(k >= 1, s"topk_by_value k must be >= 1, got $k")
        TopKByValue(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children.head, org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(1), org.apache.spark.sql.types.LongType), k)
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
