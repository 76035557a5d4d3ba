package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/**
 * Regression: sequence(1, size-2) DESCENDS for docs with < 3 tokens
 * (sequence(1, 0) = [1, 0]) and slice() then threw
 * INVALID_PARAMETER_VALUE.START, so any corpus containing short documents
 * crashed the shingle-based dedup family. Short docs must instead yield an
 * empty shingle set (= the oracle's range(1, len-1) semantics) and simply
 * never pair.
 */
class DedupShortDocSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = scratchDir("graft-shortdocs")
    Seq(
      (0L, "one", "en", "web", 3L),
      (1L, "two words", "en", "web", 9L),
      (2L, "exactly three tokens", "en", "web", 20L),
      (3L, "a longer document with clearly more than three tokens", "en", "web", 53L),
      (4L, "", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_near_minhash survives short documents") {
    // the drop-first-token variant turns the 3-token doc into a 2-token doc
    val rows = DedupQueries.queries("dedup_near_minhash")(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dedup_jaccard_topk survives short documents") {
    DedupQueries.queries("dedup_jaccard_topk")(spark, dir).collect()
  }

  test("text_fingerprint yields null shingle fingerprint for short docs") {
    val fp = TextQueries.queries("text_fingerprint")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.get(2) != null)).toMap
    assert(fp(0L) === false && fp(1L) === false && fp(4L) === false)
    assert(fp(3L) === true)
  }
}
