package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch parity: the same transforms must produce identical
  * results whether driven incrementally or in one batch. */
class EventStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def batchEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf0_001/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  // Spark's file stream source wants a directory; the test fixture is a
  // single parquet file, so stage it into a temp dir once.
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0_001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def streamEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf0_001/events.parquet").schema
    spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  test("tumblingCounts: streaming (complete mode) == batch") {
    val batch = EventStreams.tumblingCounts(batchEvents)
      .collect().map(_.toSeq).toSet

    val q = EventStreams.tumblingCounts(streamEvents)
      .writeStream.format("memory").queryName("tumbling_parity")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_parity").collect().map(_.toSeq).toSet

    assert(batch.nonEmpty && streamed == batch)
  }

  test("sessionCounts runs incrementally and closed sessions match batch") {
    val q = EventStreams.sessionCounts(streamEvents)
      .writeStream.format("memory").queryName("session_parity")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("session_parity").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    // batch reference via the same groupBy(session_window) shape
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "2 hours"), col("user_id"))
      .agg(min("ts").as("s"), max("ts").as("l"), count(lit(1)).as("n"))
      .select("user_id", "s", "l", "n").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    // append mode only emits sessions closed by the final watermark; all
    // emitted sessions must be a (large) subset of the batch sessions
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= (batch.size * 0.9).toInt,
      s"only ${streamed.size} of ${batch.size} sessions emitted")
  }

  test("userRunningTotals: final mapGroupsWithState state == batch totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.as[Event].collect().toSeq

    val input = MemoryStream[Event]
    val q = EventStreams.userRunningTotals(input.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      // feed in two micro-batches to exercise state carry-over
      val (first, second) = rows.splitAt(rows.size / 2)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
    } finally q.stop()

    // last emitted row per user = final state
    val finalState = spark.table("running_totals")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_value"), col("last_ts"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_value"), col("s.last_ts"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100), r.getLong(3))))
      .toMap

    val batch = EventStreams.userTotalsBatch(batchEvents).collect()
      .map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100), r.getLong(3))))
      .toMap

    assert(finalState == batch)
  }
}
