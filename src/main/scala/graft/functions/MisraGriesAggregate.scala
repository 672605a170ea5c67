package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayOutputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries heavy-hitters summary as a native Catalyst aggregate —
  * the bounded-memory answer to "which keys dominate this column"
  * when the key cardinality is far too large to groupBy-count
  * (Misra & Gries '82; merge step per Agarwal et al., "Mergeable
  * Summaries", PODS '12).
  *
  * The buffer is at most `k` (key, counter) pairs. Update: a tracked
  * key increments; an untracked key claims a free slot, else every
  * counter decrements by one and zeros drop (the classic pay-one-
  * decrement-all step, O(k) only on full-miss). Merge: pointwise sum,
  * then subtract the (k+1)-th largest counter from all and drop the
  * non-positive — the mergeable-summaries reduction that preserves the
  * error bound under ANY merge tree, which is exactly what Spark's
  * partial → final aggregation does.
  *
  * Guarantees over a stream of N non-null keys, independent of
  * partitioning and merge order: estimates never overcount
  * (`est ≤ true`), undercount by at most N/(k+1)
  * (`true − est ≤ N/(k+1)`), and every key with true count > N/(k+1)
  * is present in the summary. Consumers should join the candidate set
  * back to exact counts of THE CANDIDATES ONLY (a k-row semi-join, not
  * a full groupBy) when exact figures are needed.
  *
  * Scale shape: the map-side partial pass reduces each partition to a
  * ≤ k-entry summary, so the shuffle carries k·partitions rows
  * regardless of key cardinality — the difference between shipping a
  * 100 TB column's distinct keys and shipping a few hundred counters.
  *
  * Output: `array<struct<key: string, est: long>>`, est DESC then key
  * ASC. Null keys are skipped.
  */
case class MisraGriesAggregate(
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  // update() reads the key as UTF8String; the heavyHitters builder
  // inserts a cast-to-string, but a caller constructing the case class
  // directly with e.g. a LongType child must fail AT ANALYSIS, not with
  // a runtime ClassCastException deep inside an executor task.
  // (return type inferred: AbstractDataType is private[sql], not
  // nameable from this package)
  override def inputTypes = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val kv = key.eval(input)
    if (kv != null) {
      val s = kv.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // pay-one: decrement every counter, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (kk, c) => if (c <= 0) dead += kk }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b.foreach { case (kk, c) => a.update(kk, a.getOrElse(kk, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter, drop the non-positive
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (kk, c) => if (c <= 0) dead += kk }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (kk, c) => (-c, kk) }
    new GenericArrayData(sorted.map { case (kk, c) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(kk), c)): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) =>
      val bytes = kk.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.update(new String(arr, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key)
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAggregate =
    copy(key = newChildren(0))
}

object MisraGriesAggregate {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Column builder: ≤ k (key, est) heavy-hitter candidates of the
    * string `key` column, est DESC. */
  def heavyHitters(key: Column, k: Int): Column =
    GraftBridge.column(MisraGriesAggregate(
      GraftBridge.expression(key.cast("string")), k).toAggregateExpression())
}
