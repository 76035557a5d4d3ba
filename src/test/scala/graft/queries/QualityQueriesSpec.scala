package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the quality/selection family beyond the oracle hash:
  * the KMV estimator must be EXACT whenever the union sketch holds the
  * whole union, and DSIR weights must actually rank the target slice
  * above the rest (the selection property the method exists for). */
class QualityQueriesSpec extends AnyFunSuite with graft.SparkTestBase {

  test("corpus_overlap_kmv: estimate is exact when the union fits the sketch") {
    val est = QualityQueries.queries("corpus_overlap_kmv")(spark, sf0_001)
      .select(col("source_a"), col("source_b"), col("n_union"), col("n_both"))
      .collect()
    // Recompute the true fingerprint sets (same cross-posting rule).
    val d = spark.read.parquet(s"$sf0_001/documents.parquet")
    val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      .cast("binary"))
    val crossPosted = d.filter(col("doc_id") % 3 === 0)
      .withColumn("source", concat(lit("src"),
        ((col("source").substr(lit(4), lit(10)).cast("int") + 1) % 20)
          .cast("string")))
    val sets = d.unionByName(crossPosted)
      .select(col("source"), fp.as("h")).distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    var exactChecked = 0
    est.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (sets(a), sets(b))
      if ((sa ++ sb).size <= 64) {
        assert(r.getLong(2) == (sa ++ sb).size, s"union size for ($a,$b)")
        assert(r.getLong(3) == (sa & sb).size, s"intersection for ($a,$b)")
        exactChecked += 1
      }
    }
    assert(exactChecked > 0, "no pair small enough to check exactness — " +
      "shrink k or the fixture changed")
  }

  test("corpus_dsir_weights: the target slice outranks the raw corpus") {
    val top = QualityQueries.queries("corpus_dsir_weights")(spark, sf0_001)
      .collect()
    assert(top.length == 20)
    val enShareTop = top.count(_.getString(1) == "en").toDouble / top.length
    val enShareCorpus = {
      val d = spark.read.parquet(s"$sf0_001/documents.parquet")
      d.filter(col("lang") === "en").count().toDouble / d.count()
    }
    // Importance weights trained FOR the en slice must enrich it in the
    // top-k well beyond its corpus share.
    assert(enShareTop > enShareCorpus,
      s"top-20 en share $enShareTop <= corpus share $enShareCorpus")
    // Weights are sorted descending with doc_id tie-break (driver contract).
    val ws = top.map(_.getDouble(3)).toSeq
    assert(ws == ws.sorted.reverse, "not sorted by weight desc")
  }

  test("corpus_gopher_rules: rollup is consistent and discriminates") {
    val rows = QualityQueries.queries("corpus_gopher_rules")(spark, sf0_001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nPass) = (r.getLong(1), r.getLong(2))
      assert(nPass <= nDocs)
      // every per-rule failure count is bounded by the group size
      (3 to 7).foreach(i => assert(r.getLong(i) <= nDocs))
    }
    // the filter must neither pass nor kill everything (discrimination)
    val (tot, pass) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(pass > 0 && pass < tot)
  }

  test("corpus_bpe_learn: 8 distinct well-formed merges in round order") {
    val rows = QualityQueries.queries("corpus_bpe_learn")(spark, sf0_001)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 8))
    val pairs = rows.map(_.getString(1)).toSeq
    assert(pairs.distinct.size == 8, "a merge rule was learned twice")
    // every merge is "left right" over non-empty symbols
    pairs.foreach { p =>
      val parts = p.split(" ")
      assert(parts.length == 2 && parts.forall(_.nonEmpty), s"malformed pair '$p'")
    }
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("corpus_psi_drift: PSI non-negative, threshold-consistent, manual recompute agrees") {
    val rows = QualityQueries.queries("corpus_psi_drift")(spark, sf0_001)
      .collect()
    assert(rows.nonEmpty)
    // PSI = sum((p-q)ln(p/q)) >= 0 always (each term has matching signs);
    // `stable` must agree with the 0.1 threshold on the reported value.
    // (No distributional claim: at sf0.001 a source has ~50 docs per
    // parity half, where iid sampling noise legitimately crosses 0.1.)
    rows.foreach { r =>
      assert(r.getDouble(1) >= 0.0, s"${r.getString(0)}: negative PSI")
      assert(r.getBoolean(2) == (r.getDouble(1) < 0.1 + 1e-9) ||
        math.abs(r.getDouble(1) - 0.1) < 1e-6,
        s"${r.getString(0)}: stable flag disagrees with psi ${r.getDouble(1)}")
    }
    // manual recompute for one source from raw bucket counts
    val src = rows.head.getString(0)
    val d = spark.read.parquet(s"$sf0_001/documents.parquet")
      .filter(col("source") === src)
      .select(col("doc_id"), least(lit(7), floor(col("n_chars") / 120)).as("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = d.filter(_._1 % 2 == 0).groupBy(_._2).view.mapValues(_.length).toMap
    val now = d.filter(_._1 % 2 != 0).groupBy(_._2).view.mapValues(_.length).toMap
    val (tr, tn) = (ref.values.sum, now.values.sum)
    // only bins OBSERVED in either snapshot contribute (a bin empty in
    // both never forms a row in the query's groupBy) — same skip here
    val psi = (ref.keySet ++ now.keySet).toSeq.map { b =>
      val p = (now.getOrElse(b, 0) + 1).toDouble / (tn + 8)
      val q = (ref.getOrElse(b, 0) + 1).toDouble / (tr + 8)
      BigDecimal((p - q) * math.log(p / q)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(rows.head.getDouble(1) - psi) < 1e-6,
      s"$src: query PSI ${rows.head.getDouble(1)} vs manual $psi")
  }

  test("corpus_zipf_fit: slope negative, fit consistent with a driver-side least squares") {
    val rows = QualityQueries.queries("corpus_zipf_fit")(spark, sf0_001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // any corpus with frequency decay fits a negative slope; n_types
      // caps at the top-200 cut
      assert(r.getDouble(2) < 0.0, s"${r.getString(0)}: non-negative Zipf slope")
      assert(r.getLong(1) <= 200)
    }
    // recompute one language's fit from raw counts
    val lang = rows.head.getString(0)
    val counts = spark.read.parquet(s"$sf0_001/documents.parquet")
      .filter(col("lang") === lang)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w")).limit(200)
      .collect().map(_.getLong(1))
    val xy = counts.zipWithIndex.map { case (c, i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, sxy) = (xy.map(p => p._1 * p._1).sum, xy.map(p => p._1 * p._2).sum)
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(math.abs(rows.head.getDouble(2) - slope) < 1e-4,
      s"$lang: query slope ${rows.head.getDouble(2)} vs manual $slope")
  }

  test("corpus_bpe_encode: tokens bound by chars and words; merges really fire") {
    val rows = QualityQueries.queries("corpus_bpe_encode")(spark, sf0_001)
      .collect()
    assert(rows.nonEmpty)
    val d = spark.read.parquet(s"$sf0_001/documents.parquet")
      .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("w"))
    val byLang = d.groupBy("lang")
      .agg(count(lit(1)).as("nw"), sum(length(col("w"))).as("nc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (lang, nWords, nTokens) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      val (nw, nc) = byLang(lang)
      assert(nWords == nw, s"$lang word count drifted from the corpus")
      // every word is at least 1 token; char-level segmentation is the
      // ceiling; 8 learned merges must compress SOMETHING per language
      assert(nTokens >= nWords && nTokens < nc,
        s"$lang: n_tokens $nTokens outside ($nWords, $nc)")
      val fert = r.getDouble(3)
      assert(math.abs(fert - nTokens.toDouble / nWords) < 1e-5)
    }
  }
}
