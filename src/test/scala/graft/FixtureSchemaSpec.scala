package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Guard against silent driver-side testdata changes: round 7 died because
 * `events.ts` flipped from TIMESTAMP(NANOS) to timestamp[us] and the first
 * symptom was 44 distributed test failures. This spec pins the expected
 * column set and logical type of every fixture table at sf0.001 so the
 * next layout change fails ONE named test with a message naming the
 * table/column, not the whole suite.
 *
 * Timestamp columns accept TimestampType OR TimestampNTZType (the session
 * TZ is pinned UTC, so wall-clock == instant and queries are agnostic);
 * `events.ts` additionally accepts the legacy nanos-as-long layout, which
 * [[QueryPack.loadEvents]] normalizes.
 */
class FixtureSchemaSpec extends AnyFunSuite with SparkTestBase {

  private val ts = "timestamp" // marker: any timestamp flavor
  private val expected: Map[String, Seq[(String, Any)]] = Map(
    "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
                      "p_brand" -> StringType, "p_type" -> StringType,
                      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                      "o_orderdate" -> ts, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                      "l_shipdate" -> ts),
    "events"   -> Seq("event_id" -> LongType, "ts" -> ts, "user_id" -> LongType,
                      "event_type" -> StringType, "value" -> DoubleType,
                      "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
                       "lang" -> StringType, "source" -> StringType,
                       "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType, containsNull = true),
                        "label" -> IntegerType)
  )

  private def ok(table: String, col: String, actual: DataType, exp: Any): Boolean =
    exp match {
      case `ts` =>
        actual == TimestampType || actual == TimestampNTZType ||
          (table == "events" && col == "ts" && actual == LongType)
      case dt: DataType => actual == dt
    }

  expected.foreach { case (table, cols) =>
    test(s"fixture table '$table' keeps its expected layout") {
      // nanosAsLong must be on for a legacy-nanos events footer to resolve
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sf0_001/$table.parquet").schema
      assert(schema.fieldNames.toSeq == cols.map(_._1),
        s"table '$table': columns ${schema.fieldNames.mkString(",")} != expected ${cols.map(_._1).mkString(",")}")
      cols.foreach { case (name, exp) =>
        val actual = schema(name).dataType
        assert(ok(table, name, actual, exp),
          s"table '$table' column '$name': type $actual not in expected family $exp")
      }
    }
  }

  test("loadEvents normalizes ts to TimestampType whatever the encoding") {
    val df = QueryPack.loadEvents(spark, s"$sf0_001/events.parquet")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }
}
