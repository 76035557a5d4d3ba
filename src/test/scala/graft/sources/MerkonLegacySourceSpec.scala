package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.store.{MemoryMetadata, MemoryRecord, MerkonStore}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The merkon-legacy source against the reference's wire format. The
  * hand-written byte fixture pins the exact MessagePack layout
  * (MerkonDatabase.cs:128-162 object graph) so an encoder and decoder
  * bug can never cancel each other out in the round-trip tests. */
class MerkonLegacySourceSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String = {
    val d = scratchDir("graft-legacy")
    s"$d/$name"
  }

  /** Byte-literal fixture: {"docs": [["k1","{\"id\":\"k1\"}","[1.0,2.5]","2024-01-02 03:04:05Z"],
    * ["k□","m",nil,nil]], "côté": []} — unicode in keys and names, nil
    * string fields, an empty collection. */
  private def fixtureBytes: Array[Byte] = {
    def str(s: String): Array[Byte] = {
      val b = s.getBytes("UTF-8"); require(b.length < 32); (0xa0 | b.length).toByte +: b
    }
    (Array[Byte](0x91.toByte, 0x82.toByte) ++        // [ {2 collections}
      str("docs") ++ Array[Byte](0x92.toByte) ++     //   "docs": [2 entries]
      Array[Byte](0x94.toByte) ++ str("k1") ++ str("{\"id\":\"k1\"}") ++
        str("[1.0,2.5]") ++ str("2024-01-02 03:04:05Z") ++
      Array[Byte](0x94.toByte) ++ str("k□") ++ str("m") ++
        Array[Byte](0xc0.toByte, 0xc0.toByte) ++     //   nil embedding+ts
      str("côté") ++ Array[Byte](0x90.toByte)) // "côté": []
  }

  test("byte fixture decodes exactly: rows, nulls, unicode, empty collection") {
    val path = tmp("db.bin")
    Files.write(Paths.get(path), fixtureBytes)
    val rows = spark.read.format("merkon-legacy").load(path)
      .orderBy("key").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "docs" && rows(0).getString(1) == "k1")
    assert(rows(0).getString(2) == "{\"id\":\"k1\"}")
    assert(rows(0).getString(3) == "[1.0,2.5]")
    assert(rows(0).getString(4) == "2024-01-02 03:04:05Z")
    assert(rows(1).getString(1) == "k□" && rows(1).getString(2) == "m")
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))
  }

  test("encoder emits the pinned bytes for the same content") {
    val w = new MsgPack.Writer
    w.writeArrayHeader(1); w.writeMapHeader(2)
    w.writeString("docs"); w.writeArrayHeader(2)
    w.writeArrayHeader(4)
    Seq("k1", "{\"id\":\"k1\"}", "[1.0,2.5]", "2024-01-02 03:04:05Z").foreach(w.writeString)
    w.writeArrayHeader(4)
    w.writeString("k□"); w.writeString("m"); w.writeNil(); w.writeNil()
    w.writeString("côté"); w.writeArrayHeader(0)
    assert(w.toBytes.sameElements(fixtureBytes))
  }

  test("codec survives every length-boundary width (str8/16/32, array16/32, map16)") {
    val w = new MsgPack.Writer
    val strs = Seq(31, 32, 255, 256, 65535, 65536).map("x" * _)
    w.writeMapHeader(16)                       // map16 boundary
    (0 until 16).foreach { i =>
      w.writeString(s"c$i")
      if (i == 0) {
        w.writeArrayHeader(65536)              // array32 boundary
        (0 until 65536).foreach(_ => w.writeString("e"))
      } else if (i == 1) {
        w.writeArrayHeader(strs.length)
        strs.foreach(w.writeString)
      } else w.writeArrayHeader(0)
    }
    val buf = ByteBuffer.wrap(w.toBytes)
    assert(MsgPack.readMapHeader(buf) == 16)
    assert(MsgPack.readString(buf) == "c0")
    assert(MsgPack.readArrayHeader(buf) == 65536)
    (0 until 65536).foreach(_ => MsgPack.skipValue(buf))
    assert(MsgPack.readString(buf) == "c1")
    assert(MsgPack.readArrayHeader(buf) == strs.length)
    strs.foreach(s => assert(MsgPack.readString(buf) == s))
    (2 until 16).foreach { i =>
      assert(MsgPack.readString(buf) == s"c$i")
      assert(MsgPack.readArrayHeader(buf) == 0)
    }
    assert(!buf.hasRemaining)
  }

  test("column pruning and collection pushdown reach the scan") {
    val path = tmp("db.bin")
    Files.write(Paths.get(path), fixtureBytes)
    val df = spark.read.format("merkon-legacy").load(path)
      .filter(col("collection") === "docs").select("key")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.description().contains("PushedFilters: [EqualTo(collection,docs)]"))
    // pruned to what the reader must touch: the filter column + key
    assert(scan.readSchema().fieldNames.toSet.subsetOf(Set("collection", "key")))
    assert(df.collect().map(_.getString(0)).sorted.sameElements(Array("k1", "k□")))
  }

  test("a glob of exported stores fans out one partition per file") {
    val dir = scratchDir("graft-legacy-many")
    Seq("a", "b").foreach { n =>
      val st = new MerkonStore(spark)
      st.upsert(s"coll_$n", MemoryRecord(s"key_$n", null, Array(1f, 2f)))
      st.exportLegacy(s"$dir/$n.bin")
    }
    val df = spark.read.format("merkon-legacy").load(s"$dir/*.bin")
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("key").collect().map(_.getString(0)).sorted
      .sameElements(Array("key_a", "key_b")))
  }

  test("export -> import round-trips typed records through the reference format") {
    val path = tmp("rt.bin")
    val ts = java.sql.Timestamp.valueOf("2024-05-06 07:08:09")
    val recs = Seq(
      MemoryRecord("a", MemoryMetadata(is_reference = true, id = null,
        text = "hello é", description = "d"), Array(0.1f, -2.5f, 3e-7f), ts),
      MemoryRecord("b", null, null, null),
      MemoryRecord("c", MemoryMetadata(), Array.empty[Float], ts))
    import spark.implicits._
    val st = new MerkonStore(spark)
    st.upsertBatch("main", recs.toDF())
    st.upsert("other", MemoryRecord("z", null, Array(9f), ts))
    st.exportLegacy(path)

    val st2 = new MerkonStore(spark)
    assert(st2.importLegacy(path) == Seq("main", "other"))
    val got = st2.getAll("main").orderBy("key").collect()
    assert(got.length == 3)
    assert(got(0).getString(0) == "a")
    assert(got(0).getStruct(1).getAs[String]("text") == "hello é")
    assert(got(0).getSeq[Float](2) == Seq(0.1f, -2.5f, 3e-7f),
      "float embeddings must survive the JSON string hop bit-exactly")
    assert(got(0).getTimestamp(3) == ts)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    assert(got(2).getSeq[Float](2).isEmpty)
    // the imported store answers the flagship query
    val knn = st2.getNearestMatches("other", Array(9f), 1)
    assert(knn.select("key").head().getString(0) == "z")
  }

  test("a foreign binary fails with a clear format error, not an underflow") {
    val path = tmp("garbage.bin")
    Files.write(Paths.get(path), Array[Byte](0xc1.toByte, 0x00, 0x01))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("merkon-legacy").load(path).collect()
    }
    assert(e.getCause.getMessage.contains("not a Merkon legacy store"))
  }
}
