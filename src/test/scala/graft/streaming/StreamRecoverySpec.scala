package graft.streaming

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery: a restarted query must resume from the
  * checkpointed offsets AND the recovered state store — re-delivered
  * events from before the crash still dedup, already-read files are not
  * re-read, and the fault-tolerant file sink holds each event exactly
  * once. This is the property that makes the streaming gates safe to
  * kill -9 mid-backfill at 100 TB/day: at-least-once upstream plus
  * recovered dedup state = exactly-once output. */
class StreamRecoverySpec extends AnyFunSuite with SparkTestBase {

  test("dedupById survives a restart: offsets + state store recovered") {
    import spark.implicits._
    def ev(id: Long, ts: String) =
      Event(id, java.sql.Timestamp.valueOf(ts), 1L, "click", 1.0, "{}")

    val base = scratchDir("graft-recovery")
    val (in, out, chk) = (s"$base/in", s"$base/out", s"$base/chk")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    val schema = Seq.empty[Event].toDS().schema
    // the file stream source lists files flat — stage each epoch's part
    // file directly into the watched dir
    def addFile(rows: Seq[Event], name: String): Unit = {
      val tmp = s"$base/stage_$name"
      rows.toDS().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    def runOnce(): Unit = {
      val q = EventStreams.dedupById(
          spark.readStream.schema(schema).parquet(in), watermark = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // epoch 1: three events
    addFile(Seq(ev(1, "2026-01-01 10:00:00"), ev(2, "2026-01-01 10:01:00"),
      ev(3, "2026-01-01 10:02:00")), "batch_a")
    runOnce()

    // "crash", then epoch 2: event 1 RE-DELIVERED (same ts, inside the
    // watermark horizon) plus a fresh event — the dup only collapses if
    // the state store came back, and batch_a is only skipped if the
    // source offsets came back
    addFile(Seq(ev(1, "2026-01-01 10:00:00"), ev(4, "2026-01-01 10:03:00")),
      "batch_b")
    runOnce()

    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L, 4L), s"got $ids")
  }
}
