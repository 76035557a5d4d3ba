package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One KMV sketch entry: a content fingerprint plus side-membership flags
  * (used by the pair-union re-sketch; a plain per-source sketch passes 0s). */
case class KmvEntry(h: String, ia: Int, ib: Int)

/**
 * Bounded k-minimum-values aggregate: keeps the k lexicographically
 * smallest DISTINCT fingerprints seen, OR-merging the side flags across
 * every occurrence of a kept fingerprint.
 *
 * Why not `row_number() over (partition by source order by h)`: the window
 * plan sorts and shuffles EVERY distinct fingerprint — corpus-cardinality
 * rows — then discards all but k per source. This Aggregator runs with
 * partial aggregation: each task reduces its partition to at most k
 * entries per group locally, so only |partitions|×k candidates per group
 * ever cross the shuffle. At 100 TB that is the difference between
 * shuffling the distinct-content table and shuffling kilobytes — while the
 * sketch contract (exact k smallest distinct per group) is unchanged.
 *
 * Flag-merge correctness under partial aggregation: a fingerprint can be
 * locally evicted in one partition yet survive in another, losing the
 * evicted occurrence's flags — but eviction requires k smaller distinct
 * values in that partition, which force the fingerprint out of the GLOBAL
 * bottom-k too, so flags are only ever lost for entries the final sketch
 * drops anyway. Pinned partition-independent by `BottomKMinsSpec`.
 */
class BottomKMins(k: Int)
    extends Aggregator[(String, Int, Int), Seq[KmvEntry], Seq[KmvEntry]] {
  require(k > 0, s"k must be positive, got $k")

  /** Insert into an ascending-sorted bounded buffer, merging on equal h. */
  private def insert(buf: Seq[KmvEntry], e: KmvEntry): Seq[KmvEntry] = {
    val i = buf.indexWhere(_.h >= e.h)
    if (i >= 0 && buf(i).h == e.h) {
      val cur = buf(i)
      if ((e.ia | e.ib) == 0 || (cur.ia >= e.ia && cur.ib >= e.ib)) buf
      else buf.updated(i, KmvEntry(cur.h, cur.ia max e.ia, cur.ib max e.ib))
    } else if (i < 0) {
      if (buf.size >= k) buf else buf :+ e
    } else {
      val (before, after) = buf.splitAt(i)
      (before ++ (e +: after)).take(k)
    }
  }

  override def zero: Seq[KmvEntry] = Vector.empty

  override def reduce(buf: Seq[KmvEntry], in: (String, Int, Int)): Seq[KmvEntry] =
    insert(buf, KmvEntry(in._1, in._2, in._3))

  override def merge(a: Seq[KmvEntry], b: Seq[KmvEntry]): Seq[KmvEntry] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[KmvEntry]): Seq[KmvEntry] = r
  override def bufferEncoder = ExpressionEncoder[Seq[KmvEntry]]()
  override def outputEncoder = ExpressionEncoder[Seq[KmvEntry]]()
}

object BottomKMins {
  /** Untyped handle: `bottomK(64)(col("h"), col("ia"), col("ib"))`. */
  def apply(k: Int): UserDefinedFunction =
    udaf(new BottomKMins(k), ExpressionEncoder[(String, Int, Int)]())
}
