package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer for [[TopKByScore]]: keeps the k BEST
  * (score desc, then id asc) of everything offered, in a worst-at-root
  * binary heap, so an offer against a full buffer is O(log k) and
  * everything below the running k-th best is dropped on the spot.
  *
  * Ordering matches Spark SQL's `ORDER BY score DESC, id ASC` exactly:
  * score ties use primitive `==` first (so -0.0 ties 0.0, as SQL's
  * double ordering does) and `java.lang.Double.compare` otherwise
  * (so NaN sorts above every real score, as SQL's DESC does). */
final class TopKHeap(val k: Int) {
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  def size: Int = n

  /** a strictly better than b under (score desc, id asc)?
    *
    * Ties must fall through to the id for BOTH ways a double can "equal"
    * another in SQL ordering: primitive `==` (covers -0.0 == 0.0, where
    * Double.compare would NOT return 0) and `Double.compare == 0` (covers
    * NaN vs NaN, where primitive `==` is false but Spark's double ordering
    * treats them as equal — without this, two NaN-scored rows would never
    * tie-break by id and eviction order would diverge from the window). */
  @inline private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    if (sa == sb) ia < ib
    else {
      val c = java.lang.Double.compare(sa, sb)
      if (c == 0) ia < ib else c > 0
    }
  }

  def offer(s: Double, id: Long): Unit = {
    if (n < k) {
      if (n == scores.length) {
        val cap = math.min(k.toLong, scores.length * 2L).toInt
        scores = java.util.Arrays.copyOf(scores, cap)
        ids = java.util.Arrays.copyOf(ids, cap)
      }
      scores(n) = s; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (better(s, id, scores(0), ids(0))) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  def merge(o: TopKHeap): Unit = {
    var i = 0
    while (i < o.n) { offer(o.scores(i), o.ids(i)); i += 1 }
  }

  /** heap invariant: parent is WORSE than (or ties) its children, so the
    * root is the eviction candidate */
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (better(scores(p), ids(p), scores(i), ids(i))) {
        swap(i, p); i = p
      } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < n && better(scores(w), ids(w), scores(l), ids(l))) w = l
      if (r < n && better(scores(w), ids(w), scores(r), ids(r))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** (score, id) pairs best-first — rank i+1 = element i. */
  def sortedPairs(): Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    java.util.Arrays.sort(out, new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int =
        if (better(a._1, a._2, b._1, b._2)) -1
        else if (better(b._1, b._2, a._1, a._2)) 1
        else 0
    })
    out
  }

  def writeTo(bb: ByteBuffer): Unit = {
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
  }

  def byteSize: Int = 4 + n * 16
}

object TopKHeap {
  def readFrom(bb: ByteBuffer, k: Int): TopKHeap = {
    val h = new TopKHeap(k)
    val n = bb.getInt
    var i = 0
    // stored pairs already satisfy |pairs| <= k, so offers never evict
    while (i < n) { val s = bb.getDouble; val id = bb.getLong; h.offer(s, id); i += 1 }
    h
  }
}

/** Beyond-reference: exact per-key top-k as a typed aggregate — the
  * scale-correct replacement for the `row_number().over(partitionBy(key)
  * .orderBy(score desc, id asc)) <= k` window every ANN ranking tail
  * used. The window shape shuffles EVERY candidate row to its key's
  * task and sorts them all (O(C log C) per key, C = candidates); this
  * aggregate keeps a k-bounded worst-at-root heap per key with map-side
  * partial merge (ObjectHashAggregate), so each input partition emits at
  * most k pairs per key into the exchange and the per-key cost is
  * O(C log k). At 2 M candidates per query and k = 5 the exchange
  * carries ~160 heap entries per query instead of 2 M rows.
  *
  * Returns `array<struct<score double, id bigint>>` sorted best-first
  * (rank = position + 1); tie-break is bit-compatible with the window
  * ordering it replaces (spec-pinned, including score ties from
  * replicated vectors). Ids are BIGINT by design — every graft corpus id
  * is long-valued; callers with exotic id types keep the window path
  * ([[graft.operators.Similarity.rankTopK]] dispatches). */
case class TopKByScore(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  override def prettyName: String = "topk_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double score, bigint id) and k >= 1, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}, k=$k")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buffer.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val pairs = buffer.sortedPairs()
    new GenericArrayData(pairs.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.byteSize)
    buffer.writeTo(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.readFrom(ByteBuffer.wrap(bytes), k)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKByScore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column form: `topKCol(score, id, k)` aggregates to the sorted
    * best-first pair array. */
  def topKCol(score: Column, id: Column, k: Int): Column =
    ColumnShim.column(TopKByScore(
      ColumnShim.expression(score), ColumnShim.expression(id), k)
      .toAggregateExpression())
}
