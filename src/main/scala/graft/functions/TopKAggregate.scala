package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

import java.io.{ByteArrayOutputStream, DataOutputStream}
import scala.collection.mutable

/** Exact per-group top-k as a native Catalyst aggregate.
  *
  * Why (SURVEY.md §7.3 "custom Aggregator only if exact top-k is
  * needed"): the compositional answer — `row_number().over(Window
  * .partitionBy(key).orderBy(score))` then `filter(rank <= k)` —
  * shuffles EVERY candidate row to the key's reducer before discarding
  * all but k. This aggregate keeps a bounded k-element min-heap per
  * group inside Spark's hash-aggregate machinery, so the map-side
  * partial pass reduces each partition to ≤ k rows per group and the
  * shuffle carries k·partitions rows instead of everything — the
  * difference between shipping 25M scored ANN pairs and shipping 10·32
  * at 100 TB corpus scale.
  *
  * Ordering: score DESC, then `tiebreak` ASC (deterministic results on
  * score ties). The tiebreak may be ANY orderable type (long ids,
  * string doc ids, timestamps — whatever the corpus keys on); ordering
  * comes from Catalyst's interpreted ordering for its data type, the
  * same ordering ORDER BY would use. Rows with a null score or
  * tiebreak are skipped.
  *
  * Output: `array<struct<score: double, payload: <payload type>>>`
  * sorted best-first; `posexplode` it for (rank, value) rows.
  */
case class TopKAggregate(
    score: Expression,
    tiebreak: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any, Any)]] {

  require(k > 0, "k must be positive")

  /** Resolution-time guard (constructor-time would crash on unresolved
    * children): any orderable tiebreak type is accepted; anything else
    * (maps, …) is a clean analysis error instead of silent row drops. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(tiebreak.dataType, prettyName)

  private type Entry = (Double, Any, Any)

  @transient private lazy val tieOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(tiebreak.dataType)

  /** Heap dequeues the WORST entry (lowest score; tie → larger
    * tiebreak), so replacing the head keeps the best k. */
  @transient private lazy val worstFirst: Ordering[Entry] = (a: Entry, b: Entry) => {
    val c = java.lang.Double.compare(b._1, a._1) // lower score ranks first
    if (c != 0) c else tieOrd.compare(a._2, b._2) // larger tiebreak first
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[Entry] =
    mutable.PriorityQueue.empty[Entry](worstFirst)

  private def better(s: Double, t: Any, w: Entry): Boolean = {
    val c = java.lang.Double.compare(s, w._1)
    c > 0 || (c == 0 && tieOrd.compare(t, w._2) < 0)
  }

  override def update(buf: mutable.PriorityQueue[Entry], input: InternalRow)
      : mutable.PriorityQueue[Entry] = {
    val sv = score.eval(input)
    val tv = tiebreak.eval(input)
    if (sv != null && tv != null) {
      val s = sv.asInstanceOf[Double]
      if (buf.size < k || better(s, tv, buf.head)) {
        // copy: non-primitive eval results (UTF8String, arrays) reuse
        // buffers that the next input row overwrites
        val t = InternalRow.copyValue(tv)
        val p = InternalRow.copyValue(payload.eval(input))
        if (buf.size >= k) buf.dequeue()
        buf.enqueue((s, t, p))
      }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[Entry], b: mutable.PriorityQueue[Entry])
      : mutable.PriorityQueue[Entry] = {
    b.foreach { e =>
      if (a.size < k || better(e._1, e._2, a.head)) {
        if (a.size >= k) a.dequeue()
        a.enqueue(e)
      }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[Entry]): Any = {
    val sorted = buf.toArray.sortWith { (x, y) =>
      val c = java.lang.Double.compare(x._1, y._1)
      c > 0 || (c == 0 && tieOrd.compare(x._2, y._2) < 0)
    }
    new GenericArrayData(sorted.map(e =>
      new GenericInternalRow(Array[Any](e._1, e._3)): Any))
  }

  @transient private lazy val rowProjection =
    UnsafeProjection.create(Array[DataType](DoubleType, tiebreak.dataType, payload.dataType))

  override def serialize(buf: mutable.PriorityQueue[Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e =>
      val row = rowProjection(new GenericInternalRow(Array[Any](e._1, e._2, e._3)))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Entry] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(3)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      row.pointTo(arr, len)
      buf.enqueue((row.getDouble(0),
        InternalRow.copyValue(row.get(1, tiebreak.dataType)),
        InternalRow.copyValue(row.get(2, payload.dataType))))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", payload.dataType, payload.nullable))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, tiebreak, payload)
  override def prettyName: String = "graft_top_k"

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(score = newChildren(0), tiebreak = newChildren(1), payload = newChildren(2))
}

object TopKAggregate {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Column builder: exact top-k of (`score` DESC, `tiebreak` ASC)
    * carrying `payload`; no function registration needed. The tiebreak
    * keeps its own type — any orderable column works. */
  def topK(score: Column, tiebreak: Column, payload: Column, k: Int): Column =
    GraftBridge.column(TopKAggregate(
      GraftBridge.expression(score.cast("double")),
      GraftBridge.expression(tiebreak),
      GraftBridge.expression(payload), k).toAggregateExpression())
}
