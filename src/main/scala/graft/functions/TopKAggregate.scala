package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap "top-k rows per group" as a native
  * [[TypedImperativeAggregate]] — the engine-extension alternative to
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`.
  *
  * The window form shuffles EVERY input row to its group's partition
  * and fully sorts it there; this aggregate keeps an O(k) heap per
  * group, gets map-side partial aggregation (each input partition
  * contributes at most k candidates per group to the shuffle), and
  * never sorts more than k elements. At 100 TB with small k the
  * shuffle carries the answer, not the data.
  *
  * Ordering: value DESC, then id ASC — ties are deterministic. Uses
  * `java.lang.Double.compare` throughout (a total order, so NaN is
  * consistent). Result: `array<struct<id:long, value:double>>`,
  * best-first. Null value or id rows are skipped.
  */
case class TopKByValue(
    valueExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")
  // update() reads the children as Double/Long; the Column API
  // (TopKAggregate.topk_by_value) casts both inputs, so any numeric
  // column coerces there instead of ClassCastException-ing mid-job.
  // (No constructor require: pre-resolution children report unstable
  // dataTypes under Spark 4's column-node bridge.)

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_value"

  /** Heap max = the WORST retained entry (smallest value, then
    * largest id), so exceeding k pops the right element. */
  private object WorstFirst extends Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(WorstFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)],
                  e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (WorstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      add(buf, (v.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // `sorted` is ascending; in worst-first order the minimum IS the
    // best element, so plain WorstFirst yields best-first output.
    val sorted = buf.toArray.sorted(WorstFirst)
    new GenericArrayData(sorted.map { case (v, id) =>
      InternalRow(id, v): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, id) => bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByValue =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByValue =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): TopKByValue =
    copy(valueExpr = cs(0), idExpr = cs(1))
}

object TopKAggregate {
  /** Column API: `topk_by_value(value, id, k)` → best-first
    * `array<struct<id, value>>` (value DESC, id ASC, size ≤ k).
    * Inputs are cast to double/bigint here, so int/decimal columns
    * coerce instead of failing the expression's type check. */
  def topk_by_value(value: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByValue(GraftSqlBridge.expression(value.cast("double")),
        GraftSqlBridge.expression(id.cast("bigint")), k)
        .toAggregateExpression())
}
