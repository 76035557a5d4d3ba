package graft.ml

import graft.functions.VectorFunctions.{cosineSim, l2Distance, l2Norm}
import graft.functions.TopKByScore
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate nearest-neighbor search: a KMeans coarse
 * quantizer partitions the corpus into `nCentroids` cells; a query probes
 * only its `nProbe` nearest cells and scores candidates exactly.
 *
 * Scale shape (the IVF contract at 100 TB):
 *  - index build = one KMeans fit + one map-side cluster assignment; the
 *    assigned corpus is then *partitioned by cell* — the expensive part
 *    happens once, not per query;
 *  - search = tiny centroid table (nCentroids × dim floats) broadcast to
 *    route each query to nProbe cells, then an equi-join on cell id pulls
 *    only ~nProbe/nCentroids of the corpus per query, scored exactly with
 *    the codegen'd cosine kernel and reduced by the bounded partial-agg
 *    top-k. Nothing ever materializes the all-pairs space.
 *
 * Determinism: fixed KMeans seed -> stable cells -> stable results.
 * Recall vs exact brute force is pinned in IvfIndexSpec.
 */
class IvfIndex(val nCentroids: Int = 16, val nProbe: Int = 4, val seed: Long = 42L) {
  require(nProbe <= nCentroids)

  /** Cache key of the build-time params (nProbe is search-time only). */
  private[ml] def fingerprint: String = s"k$nCentroids-s$seed"

  /** id + original embedding + unit `features` vector (zero vectors dropped). */
  private def prepare(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val norm = l2Norm(col(embCol))
    df.filter(norm > 0)
      .select(col(idCol).as("id"), col(embCol).as("emb"),
        array_to_vector(transform(col(embCol), x => x / norm)).as("features"))
  }

  def build(spark: SparkSession, corpus: DataFrame, idCol: String, embCol: String): IvfIndex.Built = {
    val prepared = prepare(corpus, idCol, embCol)
    // fail fast with the actual cause before KMeans meets an empty
    // training set ("Nothing has been added to this summarizer"): a
    // corpus of only zero-norm vectors has nothing searchable. Cold
    // builds only — warm opens never reach here (r17).
    require(prepared.limit(1).count() > 0,
      "cannot build an IVF index: corpus has no searchable " +
        "(non-zero-norm) vectors")
    val model = new KMeans()
      .setK(nCentroids).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(prepared)
    val assigned = model.transform(prepared)
      .select(col("id"), col("emb"), col("cell"))
      // the 100 TB analog: write the corpus partitioned/bucketed by cell so
      // the per-query candidate join is co-located
      .repartition(col("cell"))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell", "centroid")
    IvfIndex.Built(assigned, centroids)
  }

  /**
   * Incremental ingest: assign `delta` vectors to their nearest FROZEN
   * centroid and extend the cell table — NO KMeans re-fit (the 100 TB
   * steady state is upsert-heavy, and re-clustering per ingest batch is
   * the scale-killer; codebooks only need periodic re-training, which is
   * a full [[build]]). Assignment replicates KMeans' squared-euclidean
   * argmin over the unit vector via the codegen'd l2_distance kernel
   * (float32 centroids, so a near-tie at ~1e-7 may assign differently
   * than the double-precision fit would — recall is unaffected, search
   * probes nProbe cells).
   */
  def append(built: IvfIndex.Built, delta: DataFrame,
      idCol: String, embCol: String): IvfIndex.Built = {
    val assignedDelta = IvfIndex.assignDelta(built.centroids, delta,
      idCol, embCol)
    // LWW on id collisions: a delta row REPLACES an existing row with the
    // same id (anti-join the old side) — a blind union would leave the
    // stale vector in the index and let one id occupy two top-k slots.
    // A re-added id also comes OFF the tombstone list: delete-then-upsert
    // must leave the vector live (the store's LWW order).
    IvfIndex.Built(
      built.assigned.join(assignedDelta.select("id"), Seq("id"), "left_anti")
        .unionByName(assignedDelta).repartition(col("cell")),
      built.centroids,
      built.tombstones.map(_.join(assignedDelta.select("id"), Seq("id"), "left_anti")))
  }

  /**
   * Delete by id WITHOUT touching the corpus-sized cell table: the ids
   * land on a tombstone sidecar that [[search]] anti-joins at probe time.
   * At 100 TB a delete-heavy store cannot afford a cell-table rewrite
   * (let alone a re-fit) per RemoveAsync batch — tombstones make a delete
   * O(|batch|), and [[IvfIndex.compacted]] / [[IvfIndex.compactOnDisk]]
   * fold them into the cell table once the dead fraction crosses a
   * threshold, still with no KMeans anywhere (cell assignment of live
   * rows is unchanged by deletes).
   */
  def delete(built: IvfIndex.Built, ids: DataFrame, idCol: String): IvfIndex.Built = {
    val dead = ids.select(col(idCol).as("id")).distinct()
    IvfIndex.Built(built.assigned, built.centroids,
      Some(built.tombstones.fold(dead)(t =>
        t.unionByName(dead).distinct())))
  }

  /** Top-k corpus neighbors by exact cosine for every query row, probing
    * nProbe cells per query. */
  def search(built: IvfIndex.Built, queries: DataFrame, idCol: String, embCol: String, k: Int): DataFrame =
    searchCore(built, queries, idCol, embCol, k, identity)

  /**
   * Filtered ANN ([[search]] restricted to an id allow-list): the
   * PRE-FILTER strategy — the predicate cuts the candidate set BEFORE any
   * scoring, so top-k is computed over allowed rows only and a selective
   * predicate can never silently shrink the result below k while
   * unfiltered neighbors exist in the probed cells. `allowed` is the id
   * projection of any metadata predicate (one column, the corpus id).
   *
   * Scale shape: the allow-list joins the CELL-PRUNED candidate side
   * (nProbe/nCentroids of the corpus), not the full index, via a semi-join
   * on the id — one hash shuffle of two id-sized sides. At 100 TB with a
   * hot predicate column the next step is carrying that column IN the
   * cell table so the filter becomes a pushed parquet predicate on the
   * probed cells; the semi-join form is the general-predicate fallback
   * that needs no index rebuild. Recall under filtering follows the probe
   * fraction exactly as unfiltered search does — callers compensate for
   * selective predicates by over-probing (a higher-nProbe IvfIndex), the
   * published filtered-ANN practice.
   */
  def searchFiltered(built: IvfIndex.Built, queries: DataFrame, idCol: String,
      embCol: String, k: Int, allowed: DataFrame): DataFrame = {
    val allow = allowed.toDF("id").select(col("id"))
    searchCore(built, queries, idCol, embCol, k,
      live => live.join(allow, Seq("id"), "left_semi"))
  }

  /** Every cell's rank in each query's probe order — the ONE-pass
    * calibration primitive (r17): rank r means "probed at any width
    * >= r". Spelled with the identical routing expression and
    * (cell_score desc, cell asc) total order as [[searchCore]], and
    * TopK's prefix property (top-p contains top-(p-1), TopKProps) makes
    * rank <= p exactly "this cell is probed at width p". */
  def cellRanks(built: IvfIndex.Built, queries: DataFrame, idCol: String,
      embCol: String, nCells: Int): DataFrame = {
    val q = prepare(queries, idCol, embCol)
      .select(col("id").as("q_id"), col("emb").as("q_emb"))
    q.crossJoin(broadcast(built.centroids))
      .select(col("q_id"), col("q_emb"), col("cell"),
        cosineSim(col("q_emb"), col("centroid")).as("cell_score"))
      .groupBy(col("q_id"), col("q_emb"))
      .agg(TopKByScore(nCells)(col("cell_score"), col("cell").cast("long")).as("cells"))
      .select(col("q_id"), posexplode(col("cells.id")).as(Seq("p0", "cell")))
      .select(col("q_id"), col("cell").cast("int").as("cell"),
        (col("p0") + 1).as("cell_rank"))
  }

  private def searchCore(built: IvfIndex.Built, queries: DataFrame,
      idCol: String, embCol: String, k: Int,
      candidateFilter: DataFrame => DataFrame): DataFrame = {
    val q = prepare(queries, idCol, embCol)
      .select(col("id").as("q_id"), col("emb").as("q_emb"))
    // route: query × broadcast(centroids) -> nProbe nearest cells per query
    val routed = q.crossJoin(broadcast(built.centroids))
      .select(col("q_id"), col("q_emb"), col("cell"),
        cosineSim(col("q_emb"), col("centroid")).as("cell_score"))
      .groupBy(col("q_id"), col("q_emb"))
      .agg(TopKByScore(nProbe)(col("cell_score"), col("cell").cast("long")).as("cells"))
      .select(col("q_id"), col("q_emb"), explode(col("cells.id")).as("cell"))
    // candidates: equi-join on cell, exact scoring, bounded top-k
    // (tombstoned ids filtered out of the candidate side first)
    val live = candidateFilter(built.live)
    routed.join(live, routed("cell") === live("cell"))
      .select(col("q_id"), col("id").as("n_id"),
        cosineSim(col("q_emb"), col("emb")).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKByScore(k)(col("cos"), col("n_id")).as("hits"))
      .select(col("q_id"), posexplode(col("hits")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
  }
}

object IvfIndex {

  /** The frozen-quantizer delta encode shared by the in-memory
    * [[IvfIndex.append]] and the on-disk [[appendOnDisk]]: dedup the
    * delta's ids, drop zero-norm rows, and assign each vector to its
    * argmin-l2 cell against the FROZEN centroid table (KMeans' metric
    * over the unit vector) — a map-side broadcast pass, no fit. */
  private[ml] def assignDelta(centroids: DataFrame, delta: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    val norm = l2Norm(col(embCol))
    val p = dedupDeltaIds(delta.filter(norm > 0)
      .select(col(idCol).as("id"), col(embCol).as("emb"),
        transform(col(embCol), x => (x / norm).cast("float")).as("unit")))
    p.crossJoin(broadcast(centroids))
      .select(col("id"), col("emb"),
        col("cell"), l2Distance(col("unit"), col("centroid")).as("dist"))
      .groupBy(col("id"), col("emb"))
      .agg(TopKByScore(1)(-col("dist"), col("cell").cast("long")).as("best"))
      .select(col("id"), col("emb"),
        element_at(col("best.id"), 1).cast("int").as("cell"))
  }

  /** A delta carrying the same id twice (a document upserted twice in
    * one ingest batch) must contribute exactly ONE row, or the LWW
    * anti-join against the base still leaves two live rows for the id.
    * Winner = deterministic hash order over the embedding (which copy
    * wins is arbitrary but stable run-to-run). */
  private[ml] def dedupDeltaIds(delta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(hash(col("emb")).desc)
    delta.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** A built index: the cell-assigned corpus + the centroid routing table
    * + an optional id-tombstone sidecar (rows deleted since the last
    * compaction — still physically present in `assigned`, filtered out of
    * every probe by [[live]]). Searchable whether just built or loaded
    * from disk — the fitted KMeans model is build-time-only state and is
    * NOT part of the searchable index (routing uses the centroid table). */
  case class Built(assigned: DataFrame, centroids: DataFrame,
      tombstones: Option[DataFrame] = None) {
    /** Probe-visible rows: `assigned` minus tombstoned ids. No hint on
      * the anti-join — the tombstone side is usually tiny (AQE broadcasts
      * it), but a long-uncompacted store can grow it past broadcast size
      * and the join must still plan. */
    def live: DataFrame =
      tombstones.fold(assigned)(t => assigned.join(t, Seq("id"), "left_anti"))

    /** Dead fraction — the compaction trigger signal. */
    def tombstoneFraction: Double = tombstones match {
      case None => 0.0
      case Some(t) =>
        val total = assigned.count()
        if (total == 0) 0.0 else t.count().toDouble / total
    }
  }

  /** Fold tombstones into the cell table (materialized via the caller's
    * next [[save]]) — no KMeans, no re-encode: deletes never change the
    * cell assignment of surviving rows. */
  def compacted(built: Built): Built =
    built.tombstones.fold(built)(_ =>
      Built(built.live.repartition(col("cell")), built.centroids, None))

  /**
   * SemDeDup over the index's own cell structure — the production path of
   * the oracle-checked `dedup_semantic` query (which pins the identical
   * prune against deterministic seed clusters DuckDB can replicate): a
   * vector is kept iff NO earlier-by-id vector in its IVF cell is within
   * `tau` cosine. The index IS the clustering, so semantic dedup costs
   * one within-cell pair join + one distinct + one left-anti over a table
   * the pipeline already maintains — the KMeans cells confine all
   * pairwise work, and cell count grows with the corpus, keeping the
   * per-cell fan-out bound constant at any scale. Tombstoned rows
   * neither dedup others nor survive (the prune sees [[Built.live]]).
   *
   * Returns one verdict row per live vector: (id, cell, kept).
   */
  def semanticDedup(built: Built, tau: Double): DataFrame = {
    val m = built.live
    val a = m.select(col("cell"), col("id").as("a_id"), col("emb").as("emb_a"))
    val b = m.select(col("cell"), col("id").as("b_id"), col("emb").as("emb_b"))
    val victims = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id") &&
        cosineSim(col("emb_a"), col("emb_b")) >= tau)
      .select(col("b_id").as("id")).distinct()
    m.select(col("id"), col("cell"))
      .join(victims.withColumn("removed", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(!col("removed"), lit(true)).as("kept"))
  }

  /** Persist a built index: the assigned corpus is written PARTITIONED BY
    * cell — the on-disk analog of a bucketed index table, so a search
    * probing nProbe cells prunes to those cell directories at scan time —
    * plus the tiny centroid routing table and, when deletes are pending,
    * the id-tombstone sidecar. */
  def save(built: Built, path: String): Unit = {
    built.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
    built.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
    built.tombstones.foreach(_.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/tombstones"))
  }

  private[graft] def loadOptional(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      Some(spark.read.parquet(dir))
    else None
  }

  def load(spark: SparkSession, path: String): Built =
    Built(spark.read.parquet(s"$path/assigned"),
      spark.read.parquet(s"$path/centroids"),
      loadOptional(spark, s"$path/tombstones"))

  /**
   * Per-cell on-disk compaction of a PUBLISHED index: rewrite ONLY the
   * cell directories that contain tombstoned rows (dynamic partition
   * overwrite — untouched cells keep their files byte-for-byte), then
   * drop the sidecar. The 100 TB discipline: a delete wave that hits 3 of
   * 1024 cells rewrites 3 cell directories, not the corpus, and never
   * re-runs KMeans. No-op below `minDeadFraction`.
   */
  def compactOnDisk(spark: SparkSession, path: String,
      minDeadFraction: Double = 0.0): Unit = {
    val built = load(spark, path)
    if (built.tombstones.isEmpty) return
    // gate on the RECLAIMABLE fraction (sidecar ids actually present in
    // the cell table — the same semi-join statsRows reports as the
    // cadence trigger signal), not the raw sidecar count: a sidecar can
    // hold never-indexed ids (deletes of zero-norm or never-dumped rows),
    // and the number an operator reads must be the number the gate
    // applies (ADVICE r14).
    if (minDeadFraction > 0.0) {
      val total = built.assigned.count()
      val reclaimable = built.assigned
        .join(built.tombstones.get, Seq("id"), "left_semi").count()
      if (total == 0 || reclaimable.toDouble / total < minDeadFraction) return
    }
    val affected = built.assigned.join(built.tombstones.get, Seq("id"), "left_semi")
      .select("cell").distinct().collect().map(_.get(0))
    compactPartitions(spark, s"$path/assigned", "cell", affected,
      built.live.filter(col("cell").isin(affected.toIndexedSeq: _*)))
    val t = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    t.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(t, true)
    // the metadata-carrying `augmented` sidecar (written by
    // AnnIndexRegistry.register for filtered kNN) still holds the
    // now-compacted dead rows, and with the tombstone sidecar gone they
    // would resurface through the filtered rewrite — drop it; the next
    // register() re-materializes it from the compacted cell table, and
    // until then filtered plans gracefully keep their exact scan.
    val aug = new org.apache.hadoop.fs.Path(s"$path/augmented")
    aug.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(aug, true)
  }

  /** The shared per-partition compaction step (used by [[compactOnDisk]]
    * and the [[PqIndex]]/[[IvfPqIndex]] analogs): dynamic-partition-
    * overwrite ONLY the `affected` partition values of a partitioned
    * table with their surviving rows — untouched partitions keep their
    * files byte-for-byte — and explicitly remove a FULLY-dead partition's
    * directory (dynamic overwrite never touches a partition that emits no
    * rows, so its stale files would otherwise resurface once the
    * tombstone sidecar drops). `survivors0` must be exactly the live rows
    * of the affected partitions; it is materialized before the overwrite
    * because the write would otherwise read the directories it is
    * replacing. */
  private[ml] def compactPartitions(spark: SparkSession, tablePath: String,
      partCol: String, affected: Seq[Any], survivors0: DataFrame): Unit = {
    if (affected.isEmpty) return
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val survivors = survivors0.localCheckpoint()
      survivors.write.mode("overwrite").partitionBy(partCol).parquet(tablePath)
      val alive = survivors.select(partCol).distinct().collect()
        .map(_.get(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(tablePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.filterNot(alive).foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/$partCol=$v"), true)
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /**
   * The index lifecycle a query path must use: load the prebuilt index
   * for `sourcePath` if one exists, else build + persist it once.
   * An iterative KMeans fit inside a registered query would re-run per
   * execution — a scale-killer at 100 TB, where the index is maintained
   * by an explicit index job and queries only ever read it.
   *
   * Staleness is keyed on a fingerprint of the source parquet files
   * (count + name + length + mtime + head-bytes CRC) and the quantizer
   * params, so a regenerated corpus or changed index shape rebuilds
   * instead of serving stale cells — the CRC catches a file rewritten
   * same-size within mtime granularity, which name:length:mtime alone
   * would miss.
   *
   * Concurrency: the cache root is shared (tmpdir), so the build goes to
   * a process-unique staging dir and is atomically renamed into place. A
   * concurrent builder that wins the rename is detected (the target
   * appeared) and its index is served; a reader never observes a
   * half-written index because the published path appears in one rename.
   */
  def openOrBuild(
      spark: SparkSession,
      ivf: IvfIndex,
      sourcePath: String,
      idCol: String,
      embCol: String,
      cacheRoot: String = IndexCache.DefaultIvfRoot): Built =
    load(spark, openOrBuildPath(spark, ivf, sourcePath, idCol, embCol, cacheRoot))

  /** [[openOrBuild]] but returning the PUBLISHED index directory — what
    * a caller needs to hand the index to [[graft.plans.AnnIndexRule]]
    * (the rewrite reads `path/assigned` as a cell-partition-pruned scan)
    * or to target [[compactOnDisk]]. */
  def openOrBuildPath(
      spark: SparkSession,
      ivf: IvfIndex,
      sourcePath: String,
      idCol: String,
      embCol: String,
      cacheRoot: String = IndexCache.DefaultIvfRoot): String =
    IndexCache.openOrBuildIncremental(sourcePath, ivf.fingerprint,
      cacheRoot, "assigned/_SUCCESS") { staging =>
      save(ivf.build(spark, spark.read.parquet(sourcePath), idCol, embCol), staging)
    } { (published, newFiles, staging) =>
      // source grew: encode ONLY the new files against the frozen
      // centroids — no KMeans fit anywhere on this path. The hardlink
      // fast path also avoids rewriting the corpus-sized cell table
      // (O(delta) files written); overlapping ids (LWW) fall back to
      // the rewrite form below. basePath: newFiles are LEAF files, and a
      // hive-partitioned corpus keeps its partition columns only in the
      // directory structure — without the base path a partition-column
      // id would vanish from the delta's schema and the grow path would
      // throw where it used to full-rebuild (ADVICE r15).
      val delta = spark.read.option("basePath", sourcePath)
        .parquet(newFiles: _*)
      if (!appendOnDisk(spark, published, delta, idCol, embCol, staging))
        save(ivf.append(load(spark, published), delta, idCol, embCol), staging)
    }

  /**
   * The O(delta) artifact refresh (r15): grow a PUBLISHED index into
   * `staging` by HARDLINKING every existing data file (assigned cell
   * dirs, centroid table, tombstone sidecar) and appending ONLY the
   * delta's encoded rows as new files in their cell directories — no
   * shuffle of existing rows, no corpus-sized write. Before this, the
   * append path skipped the KMeans re-fit but still re-shuffled and
   * re-wrote the whole cell table per refresh — an O(corpus) IO bill at
   * ingest cadence. [[IvfIndex.append]]'s rewrite form stays the
   * semantic fallback: links cannot express LWW row replacement, so the
   * fast path applies IFF the delta's ids are disjoint from the
   * published table AND its tombstones (the store's insert-only refresh
   * shape — its update and re-add waves full-dump upstream). Returns
   * false (staging removed) when the overlap probe fails or the
   * filesystem refuses links; the caller rewrites. At cluster scale the
   * same shape is a metadata-only manifest commit (new files
   * registered, existing files reused); the local hardlink is that
   * commit's single-node spelling — and deleting either artifact dir
   * later only unlinks names, never bytes the sibling still reads.
   * Old-artifact CONTRACT sidecars (nprobe calibration, registration
   * record, cache manifest) are deliberately not linked: the grown
   * artifact recalibrates and re-registers.
   */
  private[graft] def appendOnDisk(spark: SparkSession, published: String,
      delta: DataFrame, idCol: String, embCol: String,
      staging: String): Boolean = {
    val centroids = spark.read.parquet(s"$published/centroids")
    val d = assignDelta(centroids, delta, idCol, embCol).localCheckpoint()
    val deltaIds = d.select("id")
    val overlapsBase = spark.read.parquet(s"$published/assigned")
      .select("id").join(deltaIds, Seq("id"), "left_semi")
      .limit(1).count() > 0
    if (overlapsBase) return false
    val overlapsDead = loadOptional(spark, s"$published/tombstones")
      .exists(_.select("id").join(deltaIds, Seq("id"), "left_semi")
        .limit(1).count() > 0)
    if (overlapsDead) return false
    if (!linkArtifactTables(published, staging,
        Seq("assigned", "centroids", "tombstones"))) return false
    if (!d.isEmpty)
      d.write.mode("append").partitionBy("cell").parquet(s"$staging/assigned")
    true
  }

  /** The shared link phase of every family's [[appendOnDisk]]: hardlink
    * each existing table dir of `published` into `staging` and write a
    * FRESH (unshared) success marker per table — a linked marker would
    * share its inode with the still-served old artifact, and the delta
    * write job rewrites `_SUCCESS` in place. False (staging removed) on
    * a link-refusing filesystem; the caller falls back to the rewrite
    * form. */
  private[ml] def linkArtifactTables(published: String, staging: String,
      tables: Seq[String]): Boolean =
    try {
      tables.foreach { sub =>
        val from = new java.io.File(published, sub)
        if (from.isDirectory) {
          val to = new java.io.File(new java.io.File(staging), sub)
          linkTree(from, to)
          java.nio.file.Files.write(
            new java.io.File(to, "_SUCCESS").toPath, Array.emptyByteArray)
        }
      }
      true
    } catch {
      case _: Exception =>
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del)); f.delete()
        }
        del(new java.io.File(staging))
        false
    }

  /** Hardlink every VISIBLE file of `from` into `to`, recursing into
    * partition subdirectories; `_`-markers and `.`-checksum sidecars are
    * skipped (the new artifact writes its own — a linked marker/crc
    * would share an inode with the old artifact's, and Hadoop's local
    * FS rewrites both in place). */
  private def linkTree(from: java.io.File, to: java.io.File): Unit = {
    to.mkdirs()
    Option(from.listFiles()).toSeq.flatten.foreach { f =>
      if (f.isDirectory) linkTree(f, new java.io.File(to, f.getName))
      else if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
        java.nio.file.Files.createLink(
          new java.io.File(to, f.getName).toPath, f.toPath)
    }
  }
}
