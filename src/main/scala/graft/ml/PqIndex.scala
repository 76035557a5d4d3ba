package graft.ml

import graft.functions.VectorFunctions.{cosineSim, l2Norm}
import graft.functions.TopKByScore
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A corpus row prepared for PQ: original embedding + unit vector. */
private[ml] case class PqRow(id: Long, emb: Seq[Float], unit: Seq[Double])

/** A PQ-encoded corpus row: `codes(sub)` = nearest centroid id of
  * subvector `sub`. The embedding is kept alongside for exact re-rank. */
private[ml] case class PqCoded(id: Long, emb: Seq[Float], codes: Seq[Int])

/** A query with its ADC lookup table: `tab(sub*k + c)` = squared L2
  * distance from the query's subvector to centroid c of subspace sub. */
private[ml] case class PqQuery(q_id: Long, q_emb: Seq[Float], tab: Seq[Double])

/**
 * Product quantization ANN — the third standard index family next to LSH
 * ([[CosineLsh]]) and IVF ([[IvfIndex]]): the unit-normalized embedding is
 * split into `m` subvectors, each quantized to one of `kCentroids`
 * per-subspace KMeans centroids, so a D-dim float vector compresses to m
 * small codes (64-dim float32 → 8 bytes here, 32x). Search scores the
 * compressed codes with an ADC (asymmetric distance computation) lookup
 * table — `m` array reads + adds per candidate, no float vector math —
 * takes a shortlist, and re-ranks it EXACTLY with the codegen'd cosine
 * kernel, which restores recall that pure-PQ scoring loses to
 * quantization error.
 *
 * Scale shape:
 *  - build = m KMeans fits over subvector slices + one map-side encode;
 *    runs ONLY in the index job ([[PqIndex.openOrBuild]]), never per query;
 *  - the code table is the index: m bytes/vector instead of 4D — the scan
 *    that ADC-scores 100 TB of embeddings reads ~3 TB of codes;
 *  - search = broadcast the per-query ADC tables (|Q| × m×k doubles),
 *    stream the code table, bounded partial-agg shortlist
 *    (O(partitions × |Q| × shortlist) shuffled), then an equi-join on the
 *    shortlist ids for exact re-rank. Nothing all-pairs, no fit, no
 *    collect.
 *
 * Determinism: fixed seeds (seed + subspace), strict-< argmin tie-break on
 * centroid id, exact re-rank tie-break by id in TopKByScore.
 * On unit vectors L2² = 2 − 2·cos, so ADC-ascending equals cosine-
 * descending up to quantization error — the re-rank makes the final
 * ordering exactly cosine. Recall ≥ 0.9 vs brute force is pinned by
 * AnnRecallSpec and driver-visible via ann_recall_audit.
 */
class PqIndex(m: Int = 8, kCentroids: Int = 16, seed: Long = 42L) {

  // v2: the coded table split into (id, codes) + the id-bucketed embById
  // fetch table — versioning the fingerprint keeps a pre-split cached
  // index from being loaded with the new layout
  private[ml] def fingerprint: String = s"m$m-k$kCentroids-s$seed-v2"

  private[ml] def prepare(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val norm = l2Norm(col(embCol))
    df.filter(norm > 0)
      .select(col(idCol).as("id"), col(embCol).as("emb"),
        transform(col(embCol), x => x.cast("double") / norm).as("unit"))
  }

  def build(spark: SparkSession, corpus: DataFrame,
      idCol: String, embCol: String): PqIndex.Built = {
    import spark.implicits._
    val prepared = prepare(corpus, idCol, embCol).as[PqRow].cache()
    val dim = prepared.head().unit.size
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val d = dim / m
    // m independent per-subspace quantizers (the expensive part; index
    // job only). CONCURRENT fits (r18, guide-§2.6 overlap): each fit is
    // a chain of tiny near-single-task Spark jobs (kmeans|| init + Lloyd
    // rounds) whose cost is almost pure scheduling latency on the cached
    // input, and the m fits are fully independent (own seed, own slice
    // columns, shared read-only `prepared`), so submitting them from a
    // bounded thread pool overlaps the per-job latency — the scheduler
    // back-fills idle slots. Results are bit-identical to the sequential
    // loop: concurrency changes WHEN each deterministic fit runs, never
    // what it computes. Measured on a cold cache: the PQ/IVF-PQ build
    // queries drop ~2x (see OPTIMIZATION_r18.md).
    val fitPool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(m, 8))
    val codebooks: Array[Array[Array[Double]]] =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(fitPool)
        val fits = (0 until m).map { sub =>
          scala.concurrent.Future {
            val slices = prepared.toDF()
              .select(array_to_vector(slice(col("unit"), sub * d + 1, d))
                .as("features"))
            new KMeans().setK(kCentroids).setSeed(seed + sub)
              .setFeaturesCol("features").setPredictionCol("c")
              .fit(slices).clusterCenters.map(_.toArray)
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(fits),
          scala.concurrent.duration.Duration.Inf).toArray
      } finally fitPool.shutdown()
    // materialize the encode once: it feeds BOTH the code table and the
    // embedding fetch table (save() runs two independent write jobs, and
    // without the checkpoint each would re-run the full scan + m-subspace
    // encode)
    val coded = encodeWith(spark, prepared.toDF(), codebooks).localCheckpoint()
    val cbRows = for {
      sub <- 0 until m; c <- 0 until kCentroids
    } yield (sub, c, codebooks(sub)(c).toSeq)
    prepared.unpersist()
    PqIndex.Built(coded.select(col("id"), col("codes")),
      PqIndex.withBucket(coded.select(col("id"), col("emb"))),
      cbRows.toDF("sub", "c", "centroid"))
  }

  /** Map-side encode with the (tiny) codebooks in the task closure —
    * shared by [[build]] and [[append]]; contains no fit. */
  private[ml] def encodeWith(spark: SparkSession, prepared: DataFrame,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    val mm = m
    prepared.as[PqRow].map { r =>
      val d = r.unit.size / mm
      val codes = Array.tabulate(mm) { sub =>
        val cb = codebooks(sub)
        var best = 0; var bestDist = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var dist = 0.0; var j = 0
          while (j < d) {
            val diff = r.unit(sub * d + j) - cb(c)(j); dist += diff * diff; j += 1
          }
          if (dist < bestDist) { bestDist = dist; best = c }
          c += 1
        }
        best
      }
      PqCoded(r.id, r.emb, codes.toSeq)
    }.toDF()
  }

  /** Collect the few-KiB codebook table into the m×k×d driver array the
    * encode/ADC closures use. */
  private[ml] def codebookArray(codebooks: DataFrame): Array[Array[Array[Double]]] = {
    val cbMap = codebooks.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    Array.tabulate(m, kCentroids)((sub, c) => cbMap((sub, c)))
  }

  /**
   * Incremental ingest: encode `delta` vectors against the FROZEN
   * per-subspace codebooks and extend the code table — none of the m
   * KMeans fits re-run (PQ codebooks only need periodic re-training,
   * which is a full [[build]]; the upsert steady state must be a
   * map-side encode of the delta only).
   */
  def append(built: PqIndex.Built, delta: DataFrame,
      idCol: String, embCol: String): PqIndex.Built = {
    val spark = delta.sparkSession
    // materialize the delta encode once — it feeds both the code table
    // and the embedding fetch table (two write jobs in save()); same-id
    // rows within one delta reduce to a single deterministic winner
    // FIRST (the anti-join below only guards base-vs-delta collisions)
    val codedDelta = encodeWith(spark,
      IvfIndex.dedupDeltaIds(prepare(delta, idCol, embCol)),
      codebookArray(built.codebooks)).localCheckpoint()
    val deltaIds = codedDelta.select("id")
    // LWW on id collisions: delta rows replace same-id rows in BOTH
    // tables — a blind union would leave the stale codes/embedding
    // behind. A re-added id also comes OFF the tombstone list.
    PqIndex.Built(
      built.coded.join(deltaIds, Seq("id"), "left_anti")
        .unionByName(codedDelta.select(col("id"), col("codes"))),
      built.embById.join(deltaIds, Seq("id"), "left_anti")
        .unionByName(PqIndex.withBucket(codedDelta.select(col("id"), col("emb")))),
      built.codebooks,
      built.tombstones.map(_.join(deltaIds, Seq("id"), "left_anti")))
  }

  /** Delete by id via the tombstone sidecar — O(|batch|), no re-encode,
    * none of the m KMeans fits; [[search]] filters the code scan. Same
    * contract as [[IvfIndex.delete]]. */
  def delete(built: PqIndex.Built, ids: DataFrame, idCol: String): PqIndex.Built = {
    val dead = ids.select(col(idCol).as("id")).distinct()
    PqIndex.Built(built.coded, built.embById, built.codebooks,
      Some(built.tombstones.fold(dead)(t => t.unionByName(dead).distinct())))
  }

  /** Exact-cosine top-k per query via ADC shortlist + exact re-rank.
    * The default shortlist is sized for the synthetic uniform-random
    * corpus (PQ's worst case — no cluster structure, so quantization
    * cells are wide); real embedding corpora cluster and a much smaller
    * shortlist hits the same recall. Re-rank cost is |Q| × shortlist
    * exact scores either way — negligible next to the code scan. */
  /** Per-query ADC lookup tables (q_id, q_emb, tab), computed map-side
    * with the few-KiB codebooks in the task closure — shared by
    * [[search]] and [[IvfPqIndex.search]]. */
  private[ml] def adcQueries(codebooks: DataFrame, queries: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cbMap = codebooks.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    val mm = m; val kk = kCentroids
    prepare(queries, idCol, embCol).as[PqRow].map { r =>
      val d = r.unit.size / mm
      val tab = Array.tabulate(mm * kk) { i =>
        val sub = i / kk; val c = i % kk
        val cent = cbMap((sub, c))
        var dist = 0.0; var j = 0
        while (j < d) {
          val diff = r.unit(sub * d + j) - cent(j); dist += diff * diff; j += 1
        }
        dist
      }
      PqQuery(r.id, r.emb, tab.toSeq)
    }.toDF()
  }

  /** ADC score of a coded row against the in-scope query's `tab`: m
    * array lookups + adds per (candidate, query) — no float vector math. */
  private[ml] def adcExpr: org.apache.spark.sql.Column =
    (0 until m).map(sub =>
      element_at(col("tab"), lit(sub * kCentroids) +
        element_at(col("codes"), sub + 1) + 1)).reduce(_ + _)

  def search(built: PqIndex.Built, queries: DataFrame, idCol: String,
      embCol: String, k: Int, shortlist: Int = 0): DataFrame =
    searchCore(built, queries, idCol, embCol, k, shortlist, built.liveCoded)

  /** Filtered ANN over the PQ index ([[IvfIndex.searchFiltered]]
    * semantics): the allow-list (id projection of any metadata predicate)
    * semi-joins the CODE table before the ADC scan, so the shortlist —
    * and therefore every result — satisfies the predicate by
    * construction, and the re-rank fetch only ever touches allowed ids.
    * The semi-join streams the m-byte code rows, never embeddings; a
    * selective predicate thins the ADC scan rather than the result. */
  def searchFiltered(built: PqIndex.Built, queries: DataFrame, idCol: String,
      embCol: String, k: Int, allowed: DataFrame,
      shortlist: Int = 0): DataFrame = {
    val allow = allowed.toDF("id").select(col("id"))
    searchCore(built, queries, idCol, embCol, k, shortlist,
      built.liveCoded.join(allow, Seq("id"), "left_semi"))
  }

  private def searchCore(built: PqIndex.Built, queries: DataFrame,
      idCol: String, embCol: String, k: Int, shortlist0: Int,
      candidates: DataFrame): DataFrame = {
    // shortlist <= 0 -> the fidelity-sized default: 192 at the standard
    // 8-bit codebooks, scaled inversely with codebook width for the
    // coarse 4-bit shape (IvfGeometry.shortlistFor — measured below the
    // 0.9 contract at 192 under kc=16). An explicit caller value wins.
    val shortlist =
      if (shortlist0 > 0) shortlist0
      else IvfGeometry.shortlistFor(kCentroids, k)
    // codebooks to the driver once (m × k × d doubles — a few KiB), then
    // per-query ADC tables computed map-side
    val q = adcQueries(built.codebooks, queries, idCol, embCol)
    // negated so the bounded top-k (max-score) keeps the SMALLEST distances.
    // the ADC scan streams ONLY (id, codes) — m bytes/vector, never the
    // float embedding column (at 100 TB: ~3 TB of codes instead of the
    // full corpus; asserted on ReadSchema by PqRerankSpec)
    val short = candidates.crossJoin(broadcast(q))
      .select(col("q_id"), col("q_emb"), col("id"), (-adcExpr).as("neg_dist"))
      .groupBy(col("q_id"), col("q_emb"))
      .agg(TopKByScore(shortlist)(col("neg_dist"), col("id")).as("cand"))
      .select(col("q_id"), col("q_emb"), explode(col("cand.id")).as("id"))
    PqIndex.rerankExact(built.embById, short, k)
  }
}

object PqIndex {

  /** Hash-bucket fan-out of the embedding fetch table. Sized so a
    * shortlist's buckets are a small fraction of the corpus partitions
    * at scale; at bench scale the per-bucket files are tiny either way. */
  val EmbBuckets = 64

  private[ml] def bucketOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(id, lit(EmbBuckets)).cast("int")

  private[ml] def withBucket(idEmb: DataFrame): DataFrame =
    idEmb.select(bucketOf(col("id")).as("bucket"), col("id"), col("emb"))

  /** Compact the id-bucketed fetch table against a dead-id set: rewrite
    * ONLY the dead ids' bucket directories with their surviving rows
    * (the buckets are known from the ids alone — bounded by
    * [[EmbBuckets]]). Shared by every family's `compactOnDisk`; returns
    * the affected bucket values so a sibling bucket-partitioned table
    * (the surrogate `idMap`) can reuse them. */
  private[ml] def compactEmbBuckets(spark: SparkSession, tablePath: String,
      embById: DataFrame, dead: DataFrame): Seq[Any] = {
    val affected = dead.select(bucketOf(col("id")).as("bucket")).distinct()
      .collect().map(_.get(0)).toSeq
    IvfIndex.compactPartitions(spark, tablePath, "bucket", affected,
      embById.filter(col("bucket").isin(affected: _*))
        .join(dead, Seq("id"), "left_anti"))
    affected
  }

  /** Exact re-rank of a shortlist (q_id, q_emb, id): the embedding fetch
    * joins on (bucket, id) against the id-bucket-PARTITIONED embedding
    * table, so the tiny broadcast shortlist dynamic-partition-prunes the
    * fetch scan to the buckets it actually hits — no full-corpus
    * embedding scan rides the re-rank side. Shared by [[PqIndex.search]]
    * and [[IvfPqIndex.search]]. */
  private[ml] def rerankExact(embById: DataFrame, short: DataFrame,
      k: Int): DataFrame =
    short.withColumn("bucket", bucketOf(col("id")))
      .join(embById, Seq("bucket", "id"))
      .select(col("q_id"),
        cosineSim(col("q_emb"), col("emb")).as("cos"), col("id"))
      .groupBy(col("q_id"))
      .agg(TopKByScore(k)(col("cos"), col("id")).as("hits"))
      .select(col("q_id"), posexplode(col("hits")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))

  /** A built index: the PQ code table (id, codes — what the ADC scan
    * streams), the id-bucketed embedding fetch table (bucket, id, emb —
    * what the shortlist re-rank joins, partition-prunable on bucket),
    * the per-subspace codebooks, and an optional id-tombstone sidecar
    * (deleted rows, filtered out of the ADC scan by [[liveCoded]] —
    * the re-rank only ever joins shortlist ids, so it can never surface
    * a tombstoned row). */
  case class Built(coded: DataFrame, embById: DataFrame, codebooks: DataFrame,
      tombstones: Option[DataFrame] = None) {
    /** ADC-scannable rows: `coded` minus tombstoned ids. */
    def liveCoded: DataFrame =
      tombstones.fold(coded)(t => coded.join(t, Seq("id"), "left_anti"))
  }

  /** Persist a built index. The embedding table is written PARTITIONED
    * BY id bucket — the on-disk layout that lets the re-rank join's
    * broadcast shortlist dynamic-partition-prune the fetch scan instead
    * of re-reading every embedding (VERDICT r4 "What's wrong #2"). */
  def save(built: Built, path: String): Unit = {
    built.coded.write.mode("overwrite").parquet(s"$path/coded")
    built.embById.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/embById")
    built.codebooks.coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    built.tombstones.foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/tombstones"))
  }

  def load(spark: SparkSession, path: String): Built =
    Built(spark.read.parquet(s"$path/coded"),
      spark.read.parquet(s"$path/embById")
        .select(col("bucket").cast("int").as("bucket"), col("id"), col("emb")),
      spark.read.parquet(s"$path/codebooks"),
      IvfIndex.loadOptional(spark, s"$path/tombstones"))

  /**
   * On-disk compaction of a PUBLISHED flat-PQ index: fold the tombstone
   * sidecar into the tables and drop it — [[IvfIndex.compactOnDisk]]'s
   * contract for the third family. The flat `coded` table has no
   * partition structure to prune, so its compaction is a full rewrite of
   * the codes (m bytes/row — the table is 32× smaller than the corpus it
   * indexes, and this is the explicit maintenance job, not a query
   * path); the id-bucketed `embById` fetch table rewrites ONLY the dead
   * ids' buckets, exactly like the composite index's. No quantizer
   * re-runs. No-op below `minDeadFraction` (dead rows / coded rows).
   */
  def compactOnDisk(spark: SparkSession, path: String,
      minDeadFraction: Double = 0.0): Unit = {
    val built = load(spark, path)
    val dead = built.tombstones.getOrElse(return)
    if (minDeadFraction > 0.0) {
      val total = built.coded.count()
      if (total == 0 || dead.count().toDouble / total < minDeadFraction) return
    }
    // flat table: materialize the survivors, then overwrite in place
    // (the write would otherwise read the directory it is replacing)
    built.liveCoded.localCheckpoint()
      .write.mode("overwrite").parquet(s"$path/coded")
    compactEmbBuckets(spark, s"$path/embById", built.embById, dead)
    val t = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    t.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(t, true)
  }

  /** Load the prebuilt code table for `sourcePath` or build + publish it
    * once — the m KMeans fits never run in a registered query path (see
    * [[IndexCache]] for the fingerprint/atomic-publish discipline). */
  def openOrBuild(
      spark: SparkSession,
      pq: PqIndex,
      sourcePath: String,
      idCol: String,
      embCol: String,
      cacheRoot: String = sys.props("java.io.tmpdir") + "/graft-pq"): Built = {
    val path = IndexCache.openOrBuildIncremental(sourcePath, pq.fingerprint,
      cacheRoot, "coded/_SUCCESS") { staging =>
      save(pq.build(spark, spark.read.parquet(sourcePath), idCol, embCol), staging)
    } { (published, newFiles, staging) =>
      // source grew: encode ONLY the new files against the frozen
      // codebooks — none of the m KMeans fits run on this path; a
      // disjoint-id delta also skips the corpus-sized table rewrite
      // (hardlink append), overlaps take the LWW rewrite form. basePath
      // keeps hive partition columns visible in the leaf-file delta
      // read (ADVICE r15; see IvfIndex.openOrBuildPath)
      val delta = spark.read.option("basePath", sourcePath)
        .parquet(newFiles: _*)
      if (!appendOnDisk(spark, pq, published, delta, idCol, embCol, staging))
        save(pq.append(load(spark, published), delta, idCol, embCol), staging)
    }
    load(spark, path)
  }

  /** The flat-PQ analog of [[IvfIndex.appendOnDisk]] (r15): hardlink the
    * published code/fetch/codebook/tombstone files into `staging` and
    * append ONLY the delta's encoded rows — O(delta) files written per
    * refresh, both the 32×-compressed code table and the bucketed fetch
    * table extended, never rewritten. Disjoint-id deltas only (LWW
    * replacement falls back to the rewrite form); false on overlap or a
    * link-refusing filesystem. */
  private[graft] def appendOnDisk(spark: SparkSession, pq: PqIndex,
      published: String, delta: DataFrame, idCol: String, embCol: String,
      staging: String): Boolean = {
    val prepared = IvfIndex.dedupDeltaIds(
      pq.prepare(delta, idCol, embCol)).localCheckpoint()
    val deltaIds = prepared.select("id")
    if (spark.read.parquet(s"$published/coded").select("id")
        .join(deltaIds, Seq("id"), "left_semi").limit(1).count() > 0)
      return false
    if (IvfIndex.loadOptional(spark, s"$published/tombstones")
        .exists(_.select("id").join(deltaIds, Seq("id"), "left_semi")
          .limit(1).count() > 0)) return false
    if (!IvfIndex.linkArtifactTables(published, staging,
        Seq("coded", "embById", "codebooks", "tombstones"))) return false
    if (!prepared.isEmpty) {
      val codedDelta = pq.encodeWith(spark, prepared,
        pq.codebookArray(spark.read.parquet(s"$published/codebooks")))
        .localCheckpoint()
      codedDelta.select(col("id"), col("codes"))
        .write.mode("append").parquet(s"$staging/coded")
      withBucket(codedDelta.select(col("id"), col("emb")))
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$staging/embById")
    }
    true
  }
}
