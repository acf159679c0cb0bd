package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Grouped top-k as a REAL Catalyst aggregate (`TypedImperativeAggregate`)
  * — the repo's first custom aggregate next to its scalar codegen
  * expressions, and the scale-correct replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` idiom.
  *
  * Why it matters at 100 TB: the window form sorts EVERY group's full
  * value list after a full-width shuffle; this aggregate keeps a bounded
  * k-element min-heap per group, participates in partial aggregation
  * (map-side combine), and ships AT MOST k doubles per group per map
  * task through the shuffle — state O(k), not O(rows). NULLs are skipped
  * (SQL aggregate semantics); ties keep duplicates (top-k VALUES, not
  * distinct values); the result is the values sorted descending, so the
  * output is deterministic for any input order.
  */
case class TopKDoublesAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_doubles needs a DOUBLE input, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedDesc())

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoublesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKDoublesAgg =
    copy(child = newChildren.head)
}

/** Bounded min-heap over doubles: root = smallest kept value, so an
  * incoming value beats the heap iff it exceeds the root once full.
  */
final class TopKHeap(val k: Int) {
  private[functions] val heap = new Array[Double](k)
  private[functions] var n = 0

  def size: Int = n

  def add(v: Double): Unit = {
    if (n < k) {
      heap(n) = v
      n += 1
      var i = n - 1 // sift up
      while (i > 0 && heap((i - 1) / 2) > heap(i)) {
        val t = heap(i); heap(i) = heap((i - 1) / 2); heap((i - 1) / 2) = t
        i = (i - 1) / 2
      }
    } else if (k > 0 && v > heap(0)) {
      heap(0) = v
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var s = i
        if (l < n && heap(l) < heap(s)) s = l
        if (r < n && heap(r) < heap(s)) s = r
        if (s == i) done = true
        else { val t = heap(i); heap(i) = heap(s); heap(s) = t; i = s }
      }
    }
  }

  def addAll(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { add(other.heap(i)); i += 1 }
  }

  def sortedDesc(): Array[Double] = {
    val out = java.util.Arrays.copyOf(heap, n)
    java.util.Arrays.sort(out)
    val rev = new Array[Double](n)
    var i = 0
    while (i < n) { rev(i) = out(n - 1 - i); i += 1 }
    rev
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(heap(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    // the serialized form IS the heap array — a direct copy restores the
    // invariant without n re-sifts (fromBytes runs once per shuffle block)
    var i = 0
    while (i < n) { h.heap(i) = bb.getDouble; i += 1 }
    h.n = n
    h
  }
}

/** Grouped top-k WITH PAYLOAD — the argmax-rows shape (`TopKDoublesAgg`
  * returns bare values; most pipelines want "the k best rows", e.g.
  * per-doc top TF-IDF terms, per-query nearest ids). Same bounded-heap /
  * map-side-combine contract: at most k (double, payload) entries per
  * group per map task cross the shuffle, vs the window-rank idiom's
  * full-width shuffle + per-group sort.
  *
  * Total order, so the OUTPUT ROWS are deterministic (the window form
  * breaks score ties arbitrarily): a beats b iff score higher, or equal
  * score and payload SMALLER — i.e. exactly
  * `row_number() OVER (ORDER BY score DESC, payload ASC) <= k`.
  * Payload types: BIGINT or STRING. Rows with a NULL score or payload
  * are skipped. Result: array<struct<score, payload>> sorted by that
  * order.
  */
case class TopKStructsAgg(score: Expression, payload: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairHeap] {

  private def stringPayload: Boolean = payload.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, payload.dataType) match {
      case (DoubleType, LongType) | (DoubleType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, p) => TypeCheckResult.TypeCheckFailure(
        s"topk_structs needs (DOUBLE, BIGINT|STRING), got ($s, $p)")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", payload.dataType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, payload)

  override def createAggregationBuffer(): TopKPairHeap =
    new TopKPairHeap(k, stringPayload)

  override def update(buf: TopKPairHeap, input: InternalRow): TopKPairHeap = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      // UTF8String from an unsafe row points into a reused buffer — copy
      // before it outlives the input row
      val owned = p match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
        case other => other.asInstanceOf[AnyRef]
      }
      buf.add(s.asInstanceOf[Double], owned)
    }
    buf
  }

  override def merge(buf: TopKPairHeap, other: TopKPairHeap): TopKPairHeap = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: TopKPairHeap): Any = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    new GenericArrayData(buf.sortedDesc().map { case (s, p) =>
      new GenericInternalRow(Array[Any](s, p))
    })
  }

  override def serialize(buf: TopKPairHeap): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKPairHeap =
    TopKPairHeap.fromBytes(k, stringPayload, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructsAgg =
    copy(score = newChildren(0), payload = newChildren(1))
}

/** Bounded min-heap over (score, payload) pairs under the total order
  * "a beats b iff a.score > b.score, or equal and a.payload < b.payload":
  * the root is the WEAKEST kept pair, evicted when a stronger one
  * arrives. Payloads are java.lang.Long or UTF8String (flagged at
  * construction).
  */
final class TopKPairHeap(val k: Int, val stringPayload: Boolean) {
  private[functions] val scores = new Array[Double](k)
  private[functions] val loads = new Array[AnyRef](k)
  private[functions] var n = 0

  def size: Int = n

  private def payloadLt(a: AnyRef, b: AnyRef): Boolean =
    if (stringPayload)
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]) < 0
    else a.asInstanceOf[java.lang.Long].longValue() <
      b.asInstanceOf[java.lang.Long].longValue()

  /** entry (si, pi) is WEAKER than (sj, pj): lower score, or equal score
    * and larger payload (payload-ascending wins ties).
    */
  private def weaker(si: Double, pi: AnyRef, sj: Double, pj: AnyRef): Boolean =
    si < sj || (si == sj && payloadLt(pj, pi))

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val tp = loads(i); loads(i) = loads(j); loads(j) = tp
  }

  def add(s: Double, p: AnyRef): Unit = {
    if (n < k) {
      scores(n) = s; loads(n) = p
      n += 1
      var i = n - 1 // sift up
      while (i > 0 && weaker(scores(i), loads(i),
          scores((i - 1) / 2), loads((i - 1) / 2))) {
        swap(i, (i - 1) / 2)
        i = (i - 1) / 2
      }
    } else if (k > 0 && weaker(scores(0), loads(0), s, p)) {
      scores(0) = s; loads(0) = p
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < n && weaker(scores(l), loads(l), scores(m), loads(m))) m = l
        if (r < n && weaker(scores(r), loads(r), scores(m), loads(m))) m = r
        if (m == i) done = true
        else { swap(i, m); i = m }
      }
    }
  }

  def addAll(other: TopKPairHeap): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.loads(i)); i += 1 }
  }

  /** Entries strongest-first: score descending, payload ascending on ties. */
  def sortedDesc(): Array[(Double, AnyRef)] = {
    val idx = (0 until n).toArray
    val out = idx.map(i => (scores(i), loads(i)))
    out.sortWith { case ((sa, pa), (sb, pb)) => weaker(sb, pb, sa, pa) }
  }

  def toBytes: Array[Byte] = {
    if (stringPayload) {
      val bytes = new Array[Array[Byte]](n)
      var total = 4 + 12 * n
      var i = 0
      while (i < n) {
        bytes(i) = loads(i)
          .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
        total += bytes(i).length
        i += 1
      }
      val bb = ByteBuffer.allocate(total)
      bb.putInt(n)
      i = 0
      while (i < n) {
        bb.putDouble(scores(i)).putInt(bytes(i).length).put(bytes(i))
        i += 1
      }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) {
        bb.putDouble(scores(i))
          .putLong(loads(i).asInstanceOf[java.lang.Long].longValue())
        i += 1
      }
      bb.array()
    }
  }
}

object TopKPairHeap {
  def fromBytes(k: Int, stringPayload: Boolean,
                bytes: Array[Byte]): TopKPairHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKPairHeap(k, stringPayload)
    // direct array copy — the serialized form is already a valid heap
    var i = 0
    while (i < n) {
      h.scores(i) = bb.getDouble
      h.loads(i) =
        if (stringPayload) {
          val len = bb.getInt
          val b = new Array[Byte](len)
          bb.get(b)
          org.apache.spark.unsafe.types.UTF8String.fromBytes(b)
        } else java.lang.Long.valueOf(bb.getLong)
      i += 1
    }
    h.n = n
    h
  }
}

object TopK {
  /** Column API: `topk_doubles(v, k)` — array of the k largest non-null
    * doubles in the group, sorted descending.
    */
  def topk_doubles(v: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    ColumnBridge.column(
      TopKDoublesAgg(ColumnBridge.expression(v), k).toAggregateExpression())
  }

  /** Column API: `topk_structs(score, payload, k)` — the k best
    * (score, payload) rows of the group as array<struct<score, payload>>,
    * ordered score-descending with payload-ascending tie-break (the
    * deterministic argmax-rows shape; payload BIGINT or STRING).
    */
  def topk_structs(score: Column, payload: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    ColumnBridge.column(
      TopKStructsAgg(ColumnBridge.expression(score),
        ColumnBridge.expression(payload), k).toAggregateExpression())
  }
}
