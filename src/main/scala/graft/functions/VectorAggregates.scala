package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable buffer for [[VectorAvgAgg]]: running element-wise sum + count. */
final class VecAvgBuffer(var sum: Array[Double], var n: Long)

/** Element-wise mean of array<double> vectors — the centroid aggregate
  * powering the IVF coarse-quantizer path. A TypedImperativeAggregate with a
  * primitive double[] buffer: updates are a tight add loop, merges are
  * element-wise, and partial aggregation happens map-side like any other
  * Spark aggregate. Null or empty vectors are ignored; MIXED dimensions
  * fail loudly — truncating to the first-seen dimension would make the
  * centroid depend on which partition saw which row first (silent,
  * partitioning-dependent corruption from a single malformed vector).
  */
case class VectorAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecAvgBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_vec_avg expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_avg"

  override def createAggregationBuffer(): VecAvgBuffer = new VecAvgBuffer(null, 0L)

  override def update(buf: VecAvgBuffer, input: InternalRow): VecAvgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n > 0) {
        if (buf.sum == null) buf.sum = new Array[Double](n)
        else if (n != buf.sum.length)
          throw new IllegalArgumentException(
            s"graft_vec_avg: mixed vector dimensions ($n vs ${buf.sum.length}) " +
              "— the element-wise mean is undefined; fix or filter the column")
        var i = 0
        while (i < n) { buf.sum(i) += arr.getDouble(i); i += 1 }
        buf.n += 1
      }
    }
    buf
  }

  override def merge(a: VecAvgBuffer, b: VecAvgBuffer): VecAvgBuffer = {
    if (b.sum != null) {
      if (a.sum == null) { a.sum = b.sum.clone(); a.n = b.n }
      else {
        if (a.sum.length != b.sum.length)
          throw new IllegalArgumentException(
            s"graft_vec_avg: mixed vector dimensions (${b.sum.length} vs " +
              s"${a.sum.length}) — the element-wise mean is undefined; fix or " +
              "filter the column")
        var i = 0
        while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
        a.n += b.n
      }
    }
    a
  }

  override def eval(buf: VecAvgBuffer): Any =
    if (buf.sum == null || buf.n == 0) null
    else new GenericArrayData(buf.sum.map(_ / buf.n))

  override def serialize(buf: VecAvgBuffer): Array[Byte] = {
    val dim = if (buf.sum == null) 0 else buf.sum.length
    val bb = ByteBuffer.allocate(12 + 8 * dim)
    bb.putLong(buf.n).putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAvgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val dim = bb.getInt()
    if (dim == 0) new VecAvgBuffer(null, n)
    else {
      val sum = new Array[Double](dim)
      var i = 0
      while (i < dim) { sum(i) = bb.getDouble(); i += 1 }
      new VecAvgBuffer(sum, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvgAgg =
    copy(child = newChild)
}

/** Bounded top-k buffer for [[TopKAgg]]: a size-k binary min-heap whose root
  * is the WORST kept entry under (score desc, id asc), so each update is
  * O(log k) and the buffer never exceeds k entries. */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](math.max(k, 1))
  val ids = new Array[Long](math.max(k, 1))

  /** true if (s1,id1) ranks strictly worse than (s2,id2). Scores compare
    * via the TOTAL order `java.lang.Double.compare` (NaN greater than every
    * value, matching Spark's descending sort order, so NaN scores rank
    * first exactly as the `row_number()` window this aggregate replaces
    * did) — a raw `<` would return false for every NaN comparison, letting
    * a NaN root reject all later candidates. */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && id1 > id2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (k <= 0) return
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Entries ordered best-first: (score desc, id asc) under the same total
    * order as `worse` (NaN first, like a descending Spark sort). */
  def sortedPairs: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((s1, id1), (s2, id2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && id1 < id2)
    }
  }
}

/** Distributed top-k as a REAL aggregate: per query key, keep the k best
  * (score, id) pairs under (score desc, id asc). Because it is a
  * TypedImperativeAggregate, Spark runs it with map-side partial aggregation
  * (ObjectHashAggregate) — each input partition reduces its rows to at most
  * k entries per key BEFORE the shuffle, so the exchange carries k·P rows
  * per key instead of the full scored candidate set, and no single task ever
  * sorts a query's whole corpus. This replaces the
  * `row_number() OVER (PARTITION BY query)`-then-filter formulation, which
  * funnels every scored row of a query into one window task.
  *
  * Returns array<struct<score:double, id:bigint>> ordered best-first.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult = (score.dataType, id.dataType) match {
    case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"graft_topk expects (double, bigint, int k), got ($s, $i)")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val pairs = buf.sortedPairs
    new GenericArrayData(pairs.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, id = newRight)
}

/** [[TopKBuffer]] for STRING ids with a long payload riding along: size-k
  * min-heap under (score desc, id asc — UTF8 binary order, identical to a
  * Spark `orderBy(score.desc, id.asc)` window on strings). Stored ids are
  * CLONED on insert: a TypedImperativeAggregate's input UTF8Strings can
  * point into a reused row buffer, and keeping a reference would corrupt
  * the heap when the buffer is overwritten — the clone happens only for
  * entries that are actually kept, so rejected candidates stay
  * allocation-free. */
final class TopKStrBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](math.max(k, 1))
  val ids = new Array[org.apache.spark.unsafe.types.UTF8String](math.max(k, 1))
  val payloads = new Array[Long](math.max(k, 1))

  @inline private def worse(s1: Double, id1: org.apache.spark.unsafe.types.UTF8String,
                            s2: Double, id2: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && id1.compareTo(id2) > 0)
  }

  /** `owned=false` marks an id that may alias a reused input buffer (clone
    * before storing); merge/deserialize pass `owned=true`. */
  def insert(s: Double, id: org.apache.spark.unsafe.types.UTF8String, p: Long,
             owned: Boolean): Unit = {
    if (k <= 0) return
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = if (owned) id else id.clone(); payloads(i) = p
      size += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = if (owned) id else id.clone(); payloads(0) = p
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
  }

  /** Entries best-first: (score desc, id asc). */
  def sortedTriples: Array[(Double, org.apache.spark.unsafe.types.UTF8String, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i), payloads(i)))
    out.sortWith { case ((s1, id1, _), (s2, id2, _)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && id1.compareTo(id2) < 0)
    }
  }
}

/** [[TopKAgg]] for STRING ids with a long payload — the per-document
  * top-k-terms shape (tf-idf, keyword extraction): keep the k best
  * (score, term, payload) per group under (score desc, term asc). As a
  * TypedImperativeAggregate it runs with MAP-SIDE partial aggregation:
  * each partition reduces to ≤k entries per group before the shuffle and
  * no task ever SORTS a group's full scored term list — replacing the
  * `row_number() OVER (PARTITION BY doc ORDER BY score DESC, term)`
  * window, whose per-partition sort of the whole scored (doc, term)
  * stream was the measured driver of text_tfidf's decade curve.
  * Returns array<struct<score:double, id:string, payload:bigint>>
  * best-first. */
case class TopKStrAgg(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = payload

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, payload.dataType) match {
      case (DoubleType, StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i, p) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_str expects (double, string, bigint, int k), got ($s, $i, $p)")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", StringType),
      StructField("payload", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_str"

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    val p = payload.eval(input)
    if (s != null && i != null && p != null)
      buf.insert(s.asInstanceOf[Double],
        i.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        p.asInstanceOf[Long], owned = false)
    buf
  }

  override def merge(a: TopKStrBuffer, b: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i), b.payloads(i), owned = true); i += 1 }
    a
  }

  override def eval(buf: TopKStrBuffer): Any = {
    val triples = buf.sortedTriples
    new GenericArrayData(triples.map { case (s, id, p) =>
      InternalRow(s, id, p)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buf.size) { bytes += 8 + 4 + buf.ids(i).numBytes() + 8; i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      val idb = buf.ids(i).getBytes
      bb.putInt(idb.length); bb.put(idb)
      bb.putLong(buf.payloads(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKStrBuffer(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val len = bb.getInt()
      val idb = new Array[Byte](len)
      bb.get(idb)
      val p = bb.getLong()
      buf.insert(s, org.apache.spark.unsafe.types.UTF8String.fromBytes(idb), p,
        owned = true)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TopKStrAgg =
    copy(score = newFirst, id = newSecond, payload = newThird)
}
