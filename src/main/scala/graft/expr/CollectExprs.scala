package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_set` with a §5 aggregation-buffer bound: retains at most
  * `cap + 1` DISTINCT elements per group, and evaluates to NULL for
  * any group whose distinct count exceeds `cap`.
  *
  * Built for frequentItemSets' degenerate-basket guard (r18): the r17
  * form ran plain `collect_set` and filtered `size(its) <= cap`
  * AFTERWARDS, so one pathological basket (say 10 M distinct items)
  * materialized a 10 M-element array inside a single aggregation
  * buffer before the guard could drop it. Here the buffer stops
  * retaining the moment the group is provably over the cap (cap + 1
  * distinct elements witness that), so per-group memory is bounded by
  * the cap REGARDLESS of input — and the NULL result is exactly the
  * drop the size guard expressed. Same exchange, same
  * ObjectHashAggregate plan shape as collect_set.
  */
case class CollectSetBounded(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.HashSet[Any]] with UnaryLike[Expression] {
  require(cap > 0, s"collect_set_bounded cap must be positive, got $cap")

  // Collect pins nullable=false (collect_set never returns null); the
  // over-cap NULL result is this aggregate's whole point
  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.HashSet[Any] = mutable.HashSet.empty

  override protected lazy val bufferElementType: DataType = child.dataType

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  // stop retaining once the overflow witness (cap + 1 elements) is in
  // the buffer: the group's result is already decided (NULL)
  override def update(
      buffer: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    if (buffer.size <= cap) {
      val value = child.eval(input)
      if (value != null) buffer += convertToBufferElement(value)
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashSet[Any],
      other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (it.hasNext && buffer.size <= cap) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.HashSet[Any]): Any =
    if (buffer.size > cap) null else new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetBounded =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetBounded =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectSetBounded =
    copy(child = newChild)
  override def prettyName: String = "collect_set_bounded"
}
