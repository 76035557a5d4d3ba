package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** One kNN hit: similarity score + neighbor id. */
case class Hit(score: Double, id: Long)

/**
 * Bounded top-k-by-score aggregate for batch kNN joins.
 *
 * Why not `row_number() over (partition by q_id order by score desc)`:
 * the window plan shuffles EVERY scored (query, corpus) pair — |corpus|×|Q|
 * rows — then discards all but k per query. This Aggregator is a typed
 * UDAF, so Spark runs it with partial aggregation: each task reduces its
 * partition to at most k hits per query locally, and only |partitions|×k
 * candidates per query ever cross the shuffle. At a 100 TB corpus that is
 * the difference between shuffling the dataset and shuffling kilobytes.
 *
 * Determinism: hits are totally ordered by (score desc, id asc) — the same
 * tie-break the oracle's ROW_NUMBER uses — and both reduce and merge
 * preserve that order, so the result is partitioning-independent.
 */
class TopKByScore(k: Int) extends Aggregator[(Double, Long), Seq[Hit], Seq[Hit]] {
  require(k > 0, s"k must be positive, got $k")

  /** The bound, readable by [[graft.plans.AnnIndexRule]]'s batch-kNN
    * matcher (the aggregator instance is all the logical plan carries). */
  private[graft] def kValue: Int = k

  private def lt(a: Hit, b: Hit): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Insert into a descending-sorted bounded buffer. */
  private def insert(buf: Seq[Hit], h: Hit): Seq[Hit] =
    if (buf.size == k && !lt(h, buf.last)) buf
    else {
      val (before, after) = buf.span(lt(_, h))
      (before ++ (h +: after)).take(k)
    }

  override def zero: Seq[Hit] = Vector.empty

  override def reduce(buf: Seq[Hit], in: (Double, Long)): Seq[Hit] =
    insert(buf, Hit(in._1, in._2))

  override def merge(a: Seq[Hit], b: Seq[Hit]): Seq[Hit] = {
    // merge two sorted bounded buffers (classic merge step, then cap)
    val out = Vector.newBuilder[Hit]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && lt(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[Hit]): Seq[Hit] = r
  override def bufferEncoder = ExpressionEncoder[Seq[Hit]]()
  override def outputEncoder = ExpressionEncoder[Seq[Hit]]()
}

/**
 * Null-SKIPPING variant: rows whose score expression is null contribute
 * nothing (the untyped UDAF path would decode a null primitive double as
 * 0.0 — a phantom hit). This is what lets ONE grouped aggregation carry
 * several channel-conditional top-k lists (`when(ch === "x", score)`):
 * a streaming plan allows only one stateful aggregation, so multi-list
 * reductions must share it.
 */
class TopKByScoreNullSkipping(k: Int)
    extends Aggregator[(Option[Double], Long), Seq[Hit], Seq[Hit]] {
  private val inner = new TopKByScore(k)
  override def zero: Seq[Hit] = inner.zero
  override def reduce(buf: Seq[Hit], in: (Option[Double], Long)): Seq[Hit] =
    in._1.fold(buf)(s => inner.reduce(buf, (s, in._2)))
  override def merge(a: Seq[Hit], b: Seq[Hit]): Seq[Hit] = inner.merge(a, b)
  override def finish(r: Seq[Hit]): Seq[Hit] = r
  override def bufferEncoder = ExpressionEncoder[Seq[Hit]]()
  override def outputEncoder = ExpressionEncoder[Seq[Hit]]()
}

object TopKByScore {
  /** Untyped-DataFrame handle: `topK(3)(col("score"), col("vec_id"))`. */
  def apply(k: Int): UserDefinedFunction =
    udaf(new TopKByScore(k), ExpressionEncoder[(Double, Long)]())

  /** Null-skipping handle for channel-conditional multi-list aggregation. */
  def nullSkipping(k: Int): UserDefinedFunction =
    udaf(new TopKByScoreNullSkipping(k), ExpressionEncoder[(Option[Double], Long)]())
}
