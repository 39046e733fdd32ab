package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k aggregation (SURVEY §7.3's "bounded top-k heap"): keeps the
  * k best (score, id) pairs per group in a fixed-size heap on each
  * partition, merging heaps at the exchange — so a grouped top-k costs one
  * partial-aggregated shuffle of at most k rows per (group, partition),
  * instead of a full per-group sort (the window row_number formulation
  * sorts every candidate row).
  *
  * Ordering is (score desc, id asc) with the id tiebreak, making results
  * deterministic under any partitioning.
  */
object TopK {
  type Pair = (Double, Long) // (score, id)

  private final class TopKAgg(k: Int)
      extends Aggregator[Pair, mutable.PriorityQueue[Pair], Seq[Pair]] {
    // min-heap on (score asc, id desc): the root is the weakest entry
    private val ord: Ordering[Pair] =
      Ordering.by[Pair, (Double, Long)] { case (s, id) => (-s, id) }

    override def zero: mutable.PriorityQueue[Pair] =
      mutable.PriorityQueue.empty[Pair](ord)

    private def push(b: mutable.PriorityQueue[Pair], p: Pair) = {
      if (b.size < k) b.enqueue(p)
      else if (ord.lt(p, b.head)) { b.dequeue(); b.enqueue(p) }
      b
    }

    override def reduce(b: mutable.PriorityQueue[Pair], p: Pair) = push(b, p)
    override def merge(a: mutable.PriorityQueue[Pair],
        b: mutable.PriorityQueue[Pair]) = { b.foreach(push(a, _)); a }
    override def finish(b: mutable.PriorityQueue[Pair]): Seq[Pair] =
      b.toSeq.sortBy { case (s, id) => (-s, id) }
    override def bufferEncoder: Encoder[mutable.PriorityQueue[Pair]] =
      Encoders.kryo[mutable.PriorityQueue[Pair]]
    override def outputEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
  }

  /** Per-group top-k over `(groupCol, scoreCol, idCol)`: one row per
    * (group, rank) with rank 1..k by score desc, id tiebreak. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val agg = new TopKAgg(k).toColumn
    val pairs = df.select(col(groupCol).as("g"),
        struct(col(scoreCol).cast("double").as("_1"),
          col(idCol).cast("long").as("_2")).as("p"))
    import pairs.sparkSession.implicits._
    pairs.as[(Long, (Double, Long))]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .toDF("g", "topk")
      .select(col("g").as(groupCol),
        posexplode(col("topk")).as(Seq("rank0", "e")))
      .select(col(groupCol), (col("rank0") + 1).cast("long").as("rank"),
        col("e._2").as(idCol), col("e._1").as(scoreCol))
  }
}
