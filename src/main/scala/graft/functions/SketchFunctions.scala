package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/**
 * Column façade over Spark's internal bloom-filter expressions (the pair
 * Catalyst itself injects for runtime join pruning, but does not register
 * as public SQL functions). Reusing them beats re-implementing: the
 * aggregate's buffer is Tungsten-managed, merge is a bitwise OR of
 * fixed-size segments (partial-agg friendly — the 100 TB build is one
 * map-side pass plus a tiny merge), and might_contain is codegen'd.
 *
 * The serialized filter for a few hundred thousand build keys is ~100 KiB
 * — small enough to collect and embed as a literal, exactly like the PQ
 * codebooks (ml/PqIndex.scala); the BUILD stays fully distributed.
 */
object SketchFunctions {

  /** Aggregate: build a bloom filter over `hashed` (must be LongType —
    * hash first with xxhash64, the same hash might_contain probes with). */
  def bloomFilterAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: true if `hashed` may be in the serialized filter (false
    * positives possible, false negatives impossible — callers that need
    * exactness re-verify with the real join, using this as a prefilter). */
  def mightContain(bloom: Array[Byte], hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(Literal(bloom, BinaryType),
      Bridge.expression(hashed)))
}
