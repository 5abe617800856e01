package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Bounded per-group top-k rows — the Spark-native replacement for the
  * reference's newest-shard-first early exit on `last/first n`
  * (`/root/reference/src/timeseries/timeseries.re:197-231`).
  *
  * `Window.partitionBy(series).orderBy(t)` + `row_number` shuffles EVERY
  * row of a series through one reducer; fine at 60k rows, fatal when one
  * series holds billions. As a `TypedImperativeAggregate`, this op gets
  * map-side partial aggregation: each input partition reduces to at most k
  * rows per series before the shuffle, bounding the exchange to
  * `partitions * k` rows per series regardless of input size.
  *
  * Input: a struct whose FIRST TWO fields are the ordering key
  * `(t long, event_id long)` — event_id pins the tie order the reference
  * leaves unspecified. Output: array of structs sorted by the key
  * (desc for the Last family, asc for First).
  */
case class TopKRows(
    child: Expression,
    k: Int,
    descending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length >= 2 &&
        s(0).dataType == LongType && s(1).dataType == LongType =>
      if (k > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("k must be positive")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"topk_rows expects struct<long, long, ...>, got $other")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, descending)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow] match {
        case u: UnsafeRow => u.copy()
        case r            => toUnsafe(r).copy()
      }
      b.add(row)
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = { b.mergeWith(other); b }

  override def eval(b: TopKBuffer): Any = new GenericArrayData(b.sortedRows.toArray[Any])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val rows = b.rows
    out.writeInt(rows.length)
    rows.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new TopKBuffer(k, descending)
    var i = 0
    while (i < n) {
      val len = buf.getInt
      val arr = new Array[Byte](len)
      buf.get(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      b.add(row)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)
  override def prettyName: String = "topk_rows"
}

/** Bounded heap of UnsafeRows keyed by (getLong(0), getLong(1)).
  * Head of the queue = the row to evict first (the worst kept row).
  */
final class TopKBuffer(k: Int, descending: Boolean) {

  private def cmpKey(a: UnsafeRow, b: UnsafeRow): Int = {
    val c = java.lang.Long.compare(a.getLong(0), b.getLong(0))
    if (c != 0) c else java.lang.Long.compare(a.getLong(1), b.getLong(1))
  }

  // head = max under this ordering = the worst element for our direction
  private val evictionOrder: Ordering[UnsafeRow] =
    if (descending) (a: UnsafeRow, b: UnsafeRow) => cmpKey(b, a) // head = smallest
    else (a: UnsafeRow, b: UnsafeRow) => cmpKey(a, b)            // head = largest

  private val q = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](evictionOrder)

  /** True if `r` ranks strictly better than the current worst. */
  private def better(r: UnsafeRow, worst: UnsafeRow): Boolean =
    if (descending) cmpKey(r, worst) > 0 else cmpKey(r, worst) < 0

  def add(r: UnsafeRow): Unit =
    if (q.size < k) q.enqueue(r)
    else if (better(r, q.head)) { q.dequeue(); q.enqueue(r) }

  def mergeWith(other: TopKBuffer): Unit = other.rows.foreach(add)

  def rows: Seq[UnsafeRow] = q.toSeq

  def sortedRows: Seq[UnsafeRow] = {
    val natural = q.toSeq.sortWith((a, b) => cmpKey(a, b) < 0)
    if (descending) natural.reverse else natural
  }
}

object TopKRows {
  /** `topk_rows(struct(t, event_id, ...), k, desc)` as a Column aggregate. */
  def topk_rows(packed: Column, k: Int, descending: Boolean): Column =
    ColumnShim.column(
      TopKRows(ColumnShim.expression(packed), k, descending).toAggregateExpression())
}
