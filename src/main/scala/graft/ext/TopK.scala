package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregation (SURVEY §7.3's "bounded top-k heap"): keeps the
  * k best (score, id) pairs per group in a fixed-size heap on each
  * partition, merging heaps at the exchange — so a grouped top-k costs one
  * partial-aggregated shuffle of at most k rows per (group, partition),
  * instead of a full per-group sort (the window row_number formulation
  * sorts every candidate row).
  *
  * The buffer is a pair of primitive arrays forming a binary min-heap on
  * (score asc, id desc) — root is the weakest kept pair — serialized as a
  * flat `4 + 16·n`-byte frame (the same mergeable-sketch shape as
  * [[MinHashSignature]]); no boxed pairs, no Kryo round-trips on partial
  * merges (the cost the previous `Aggregator[PriorityQueue]` formulation
  * paid on every exchange row).
  *
  * Ordering is (score desc, id asc) with the id tiebreak, making results
  * deterministic under any partitioning.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  // is (s1, i1) a WORSE pair than (s2, i2) under (score desc, id asc)?
  // IEEE == first: ±0.0 compare equal (Spark's nanSafeCompareDoubles and
  // DuckDB agree) and resolve via the id tiebreak — Double.compare alone
  // would order -0.0 < 0.0 and diverge from a window-function oracle at a
  // k-boundary tie. NaN fails ==, falling through to Double.compare, whose
  // total order (NaN > +Inf, matching Spark's sort semantics) also evicts a
  // NaN stranded in an under-full heap; compare(NaN, NaN) == 0 still ends
  // at the id tiebreak.
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (s1 == s2) i1 > i2
    else {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

  def push(s: Double, id: Long): Unit =
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      var i = n - 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else i = 0
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** Kept pairs best-first: (score desc, id asc) under the same total
    * order as eviction (NaN sorts as the largest score, like Spark's
    * descending sort). */
  def sorted(): Array[(Double, Long)] =
    Array.tabulate(n)(i => (scores(i), ids(i)))
      .sortWith { case ((s1, i1), (s2, i2)) => worse(s2, i2, s1, i1) }
}

/** (score, id) → the k best pairs as `array<struct(score, id)>`, best
  * first. */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buf.push(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.push(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted().map { case (s, id) =>
      InternalRow(s, id): Any
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val id = bb.getLong()
      buf.push(s, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopK {
  /** Per-group top-k over `(groupCol, scoreCol, idCol)`: one row per
    * (group, rank) with rank 1..k by score desc, id tiebreak. Plain
    * `groupBy.agg` — the aggregate partials are the bounded buffers, so the
    * exchange carries ≤ k pairs per (group, partition). */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(ColumnBridge.column(TopKPairs(
          ColumnBridge.expression(col(scoreCol).cast("double")),
          ColumnBridge.expression(col(idCol).cast("long")), k)
        .toAggregateExpression()).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("rank0", "e")))
      .select(col(groupCol), (col("rank0") + 1).cast("long").as("rank"),
        col("e.id").as(idCol), col("e.score").as(scoreCol))

}
