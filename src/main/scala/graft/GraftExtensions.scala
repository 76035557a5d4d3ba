package graft

import graft.functions.{CosineSimilarity, DotProduct, L2Distance, L2Norm, NfcNormalize, SimHashBands}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Spark-native installation point for the library: add
 * `spark.sql.extensions=graft.GraftExtensions` to any session conf
 * (spark-submit, Thrift server, notebook) and the vector kernel family is
 * available as SQL functions in every session of that application — no
 * per-session `register()` call, no driver code.
 *
 * This is the idiomatic way a Spark library ships Catalyst additions:
 * the SQL function family plus the two registered-artifact optimizer
 * rules ([[graft.plans.AnnIndexRule]] — the SURVEY §4 ANN rewrite, which
 * serves registered literal-query kNN plans from the persisted IVF
 * index — and [[graft.plans.RollupRewriteRule]], aggregate navigation
 * over registered pre-aggregated rollups). Sessions not built with the
 * extension get each rule installed at its registry's `register` time
 * instead.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.AnnIndexRule)
    ext.injectOptimizerRule(_ => graft.plans.RollupRewriteRule)
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine similarity of two ARRAY<FLOAT>"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two ARRAY<FLOAT>"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("l2_distance"),
      info("l2_distance", "l2_distance(a, b) - Euclidean distance of two ARRAY<FLOAT>"),
      (es: Seq[Expression]) => L2Distance(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - Euclidean norm of an ARRAY<FLOAT>"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash_bands"),
      info("simhash_bands",
        "simhash_bands(emb, seed, bandBits, numBands) - banded SimHash LSH keys for an ARRAY<FLOAT>"),
      (es: Seq[Expression]) => SimHashBands(es(0),
        GraftExtensions.literalArg(es, 1, "seed"),
        GraftExtensions.literalArg(es, 2, "bandBits").toInt,
        GraftExtensions.literalArg(es, 3, "numBands").toInt)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonicalization (same semantics as DuckDB's nfc_normalize)"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    // Catalyst's internal runtime-filter bloom pair, surfaced as SQL
    // (Spark builds them for join pruning but never registers them):
    // bloom_filter_agg(xxhash64(k), items, bits) → BINARY sketch;
    // might_contain(sketch, xxhash64(k)) probes it.
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(hashedLong, estItems, numBits) - build a bloom filter sketch (BINARY)"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bloom, hashedLong) - probe a bloom_filter_agg sketch"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))
  }
}

object GraftExtensions {
  /** The LSH params are index-shape constants, not per-row data: require
    * foldable literal arguments (`simhash_bands(emb, 42, 7, 96)`). */
  private[graft] def literalArg(es: Seq[Expression], i: Int, name: String): Long = {
    require(i < es.length && es(i).foldable,
      s"simhash_bands: argument '$name' must be a literal")
    es(i).eval(null) match {
      case n: java.lang.Number if n.doubleValue() == n.longValue() => n.longValue()
      case other => throw new IllegalArgumentException(
        s"simhash_bands: argument '$name' must be integral, got $other")
    }
  }
}
