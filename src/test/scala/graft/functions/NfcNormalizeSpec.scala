package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** NFC canonicalization expression: composition semantics, the no-alloc
  * fast path on already-normalized input, null flow, and both evaluation
  * modes (interpreted via the helper, codegen via a DataFrame plan).
  * All non-ASCII text is spelled with explicit \u escapes so composed
  * (U+00E9) vs decomposed (U+0065 U+0301) forms are unambiguous in
  * source. */
class NfcNormalizeSpec extends AnyFunSuite with graft.SparkTestBase {

  private val decomposed = "cafe\u0301" // 5 code points, NFD
  private val composed = "caf\u00e9"    // 4 code points, NFC

  private def nfc(c: org.apache.spark.sql.Column) =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  test("composes decomposed sequences to NFC") {
    val out = NfcNormalize.normalize(UTF8String.fromString(decomposed))
    assert(out.toString == composed)
    assert(out.numChars() == 4)
  }

  test("already-normalized input returns the same instance (no copy)") {
    val s = UTF8String.fromString("plain ascii text")
    assert(NfcNormalize.normalize(s) eq s)
    val c = UTF8String.fromString(composed)
    assert(NfcNormalize.normalize(c) eq c)
  }

  test("codegen path over a DataFrame matches, nulls propagate") {
    val df = spark.createDataFrame(Seq(
      (1L, "e\u0301clair"), (2L, "ascii"), (3L, null.asInstanceOf[String])
    )).toDF("id", "s")
    val got = df.select(col("id"), nfc(col("s")).as("n"))
      .orderBy(col("id")).collect()
    assert(got(0).getString(1) == "\u00e9clair")
    assert(got(1).getString(1) == "ascii")
    assert(got(2).isNullAt(1))
  }

  test("registered as SQL function by GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("graft-nfc-ext-test")
        .withExtensions(new graft.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = ext.sql(s"SELECT nfc_normalize('e\u0301') AS n, " +
        s"length(nfc_normalize('e\u0301')) AS l").head()
      assert(r.getString(0) == "\u00e9")
      assert(r.getInt(1) == 1)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
