package graft.store

import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

import scala.collection.mutable

/**
 * Spark-native rebuild of the reference's complete public API surface:
 * `MerkonDatabase` (storage ops A1-A19, /root/reference/src/MerkonDB/
 * MerkonDatabase.cs) + `MerkonMemoryStore` (query ops B1-B12,
 * /root/reference/src/Connectors.Memory.Merkon/MerkonMemoryStore.cs).
 *
 * Architecture (deliberately NOT a translation of the reference's
 * dict-of-lists heap store):
 *  - a collection is an immutable `DataFrame` with the fixed record schema
 *    [[MerkonStore.recordSchema]]; the store is a name -> DataFrame catalog,
 *  - mutations are declarative plan rewrites (union / anti-join / window
 *    keep-latest), so every operation distributes: nothing ever collects
 *    rows to the driver,
 *  - upserts carry a store-assigned monotonic `_seq` column; "last writer
 *    wins" is `row_number() over (partition by key order by _seq desc) = 1`
 *    — the reference's in-place list update (MerkonDatabase.cs:93-103) has
 *    call-order semantics, `_seq` is that call order made explicit and
 *    shuffle-safe,
 *  - persistence is one parquet directory per collection ([[save]]/[[load]])
 *    instead of the reference's whole-database MessagePack blob rewritten on
 *    every mutation (MerkonDatabase.cs:149-162, its biggest non-scalability);
 *    at 100 TB a collection is a partitioned parquet table and [[compact]]
 *    is the periodic keep-latest materialization job.
 *
 * Deliberate semantic deviations (documented per SURVEY.md §7.2):
 *  - `getBatch` does NOT reproduce the reference's truncate-on-first-missing
 *    -key bug (MerkonMemoryStore.cs:97-100) — missing keys are just absent,
 *  - no Save-per-mutation, no double-write upsert (MerkonMemoryStore.cs:
 *    242-260) — one logical upsert per call,
 *  - kNN ties break by key ascending (the reference's insertion-order tie
 *    break, MerkonMemoryStore.cs:146, is not reproducible across partitions).
 */
class MerkonStore(spark: SparkSession) {
  import MerkonStore._

  // Invariant: every stored DataFrame has recordSchema and is already
  // deduplicated by key (keep-latest applied at upsert time).
  private val collections = mutable.LinkedHashMap.empty[String, DataFrame]

  private def emptyCollection: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], recordSchema)

  // ---- Collection DDL (A1, A3, A5, A6 / B2) ----

  /** A1 `AddCollection` — idempotent create. */
  def createCollection(name: String): Unit =
    if (!collections.contains(name)) collections(name) = emptyCollection

  /** A5 `IsCollectionExists`. */
  def doesCollectionExist(name: String): Boolean = collections.contains(name)

  /** A3 `GetCollections`. */
  def getCollections: Seq[String] = collections.keys.toSeq

  /** A6 `RemoveCollection`. An indexed collection's registration is
    * revoked (durably — the persisted record goes too) and its snapshot
    * dump deleted, so the GC keep-guard stops protecting the orphaned
    * artifacts and the next `gcIndexCache` sweep reclaims them; without
    * this, collection churn in a long-lived session would pin one
    * corpus-scale artifact pair per deleted collection (r15 review). */
  def deleteCollection(name: String): Boolean = {
    indexedCollections.remove(name).foreach { dump =>
      graft.plans.AnnIndexRegistry.deregister(dump)
      val p = new org.apache.hadoop.fs.Path(dump)
      scala.util.Try(
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true))
    }
    recordedIndexes.remove(name)
    pendingDumpKeys.remove(name)
    dumpFingerprints.remove(name)
    collections.remove(name).isDefined
  }

  /** Expose every collection as a temp view (`prefix<name>`) so the whole
    * store is queryable from pure SQL alongside the GraftExtensions
    * functions — the Spark-native reading of SURVEY §1.3's "collection
    * catalog = spark.catalog temp views". */
  def registerViews(prefix: String = "merkon_"): Unit =
    collections.foreach { case (name, df) =>
      df.createOrReplaceTempView(prefix + viewSafe(name))
    }

  // ---- Upsert (A9 / B3, B4) ----

  /**
   * B4 `UpsertBatchAsync` — one distributed upsert for the whole batch
   * (the reference loops per record, MerkonMemoryStore.cs:71-78).
   * Key is forced to `metadata.id` (MerkonMemoryStore.cs:240); rows whose
   * metadata.id is null keep their provided key.
   */
  def upsertBatch(name: String, records: DataFrame): Unit = {
    createCollection(name)
    // Stored state is pre-deduped, so a two-level seq (old=0, new=1) fully
    // encodes "last writer wins". Within-batch duplicate keys resolve
    // arbitrarily (the reference's within-batch iteration order has no
    // distributed equivalent; callers should key batches uniquely).
    val incoming = conform(records)
      .withColumn("key", coalesce(col("metadata.id"), col("key")))
      .withColumn(SeqCol, lit(1L))
    val old = collections(name).withColumn(SeqCol, lit(0L))
    collections(name) = keepLatest(old.unionByName(incoming))
    // journal the touched keys for an INDEXED collection: what the next
    // [[buildIndex]] reads to keep its snapshot dump append-shaped
    // (insert-only delta -> new files only; a pending key that already
    // exists in the dump -> full re-dump). Plan-lineage over the same
    // incoming frame the collection union holds, so the journal can
    // never disagree with the data.
    if (pendingDumpKeys.contains(name))
      pendingDumpKeys(name) =
        pendingDumpKeys(name).unionByName(incoming.select("key"))
  }

  /** B3 `UpsertAsync` — single-record convenience over [[upsertBatch]]. */
  def upsert(name: String, record: MemoryRecord): String = {
    import spark.implicits._
    val key = Option(record.metadata).flatMap(m => Option(m.id)).getOrElse(record.key)
    upsertBatch(name, Seq(record.copy(key = key)).toDF())
    key
  }

  // ---- Reads (A2, A4 / B5, B6, B10) ----

  /** A4 / B10 `GetCollection`/`GetAllAsync` — full scan with the lazy
    * empty-key purge the reference applies before every scan
    * (MerkonMemoryStore.cs:226, MerkonDatabase.cs:72-88). */
  def getAll(name: String, withEmbeddings: Boolean = true): DataFrame =
    project(purgeEmptyKeys(current(name)), withEmbeddings)

  /** A2 / B5 `GetAsync` — point read; embedding projected away unless
    * `withEmbedding` (MerkonMemoryStore.cs:275-288). */
  def get(name: String, key: String, withEmbedding: Boolean = false): DataFrame =
    project(current(name).filter(col("key") === key), withEmbedding).limit(1)

  /** B6 `GetBatchAsync` — distributed semi-join against the key set
    * (no truncation-on-missing bug). */
  def getBatch(name: String, keys: Seq[String], withEmbeddings: Boolean = false): DataFrame = {
    import spark.implicits._
    val keyDf = keys.toDF("key")
    project(current(name).join(broadcast(keyDf), Seq("key"), "left_semi"), withEmbeddings)
  }

  // ---- Deletes (A7, A8 / B7) ----

  /** B7 `RemoveBatchAsync` — anti-join rewrite. A collection with a
    * registered ANN index also gets the keys TOMBSTONED at the published
    * index (see [[tombstoneIndex]]), so `getNearestMatches(useIndex =
    * true)` stops surfacing them immediately — at full k, because the
    * probe itself filters (next-best rows backfill), not just the
    * live-collection metadata join. */
  def removeBatch(name: String, keys: Seq[String]): Unit = {
    import spark.implicits._
    if (collections.contains(name)) {
      val keyDf = keys.toDF("key")
      collections(name) = current(name).join(broadcast(keyDf), Seq("key"), "left_anti")
      tombstoneIndex(name, keys)
    }
  }

  /** Deletes reach the registered index as an id-tombstone sidecar at
    * the PUBLISHED index path — O(|batch|) bookkeeping the very next
    * probe observes; no KMeans, no snapshot re-dump, no rebuild. EACH
    * registered artifact owns its deletes: when the entry carries an
    * IVF-PQ sibling, the same keys land in the sibling's own sidecar too
    * (xxhash64 surrogates when the sibling is surrogate-keyed), so the
    * codes-table serve path never depends on another artifact's sidecar
    * surviving — compacting the IVF artifact (which drops ITS sidecar)
    * can never resurrect deleted rows on the family-served path. Fold
    * tombstones in physically with [[compactIndex]] on a cadence. (A
    * delete-then-re-upsert of the same key stays hidden from the INDEXED
    * path until the next [[buildIndex]] — the snapshot contract; the
    * exact path sees it immediately.) */
  private def tombstoneIndex(name: String, keys: Seq[String]): Unit =
    indexedCollections.get(name).foreach { dump =>
      graft.plans.AnnIndexRegistry.lookup(dump).foreach { entry =>
        import spark.implicits._
        val dead = keys.toDF("id")
        graft.plans.AnnIndexRegistry.mergeTombstones(spark,
          s"${entry.indexPath}/tombstones", dead)
        entry.pq.foreach { fam =>
          graft.plans.AnnIndexRegistry.mergeTombstones(spark,
            s"${fam.indexPath}/tombstones",
            graft.plans.AnnIndexRegistry.famDeadIds(spark, fam, dead))
        }
      }
    }

  /** Fold pending deletes into the registered index PHYSICALLY — the
    * maintenance job behind [[removeBatch]]'s sidecar bookkeeping, run
    * on a cadence (e.g. when the dead fraction crosses
    * `minDeadFraction`). Family-aware: the IVF-PQ sibling compacts
    * FIRST ([[graft.ml.IvfPqIndex.compactOnDisk]] — probed cell dirs +
    * fetch/idMap buckets), then the IVF artifact
    * ([[graft.ml.IvfIndex.compactOnDisk]]); see
    * [[graft.plans.AnnIndexRegistry.compact]] for the ordering
    * rationale. No-op for a collection without a [[buildIndex]]. */
  def compactIndex(name: String, minDeadFraction: Double = 0.0): Unit =
    indexedCollections.get(name).foreach { dump =>
      graft.plans.AnnIndexRegistry.compact(spark, dump, minDeadFraction)
    }

  /** Operator-facing view of a collection's registered index state — the
    * numbers the [[compactIndex]] / [[gcIndexCache]] cadence decisions
    * read: one row per artifact family with its published path, geometry,
    * live/tombstoned row counts, and dead fraction (the
    * `minDeadFraction` trigger signal). Row counts are parquet-metadata
    * reads, no column scan. Empty frame when no [[buildIndex]] ran. */
  def indexStats(name: String): DataFrame = {
    import spark.implicits._
    indexedCollections.get(name).toSeq
      .flatMap(dump => graft.plans.AnnIndexRegistry.statsRows(spark, dump))
      .map { case (fam, path, c, p, m, kc, rows, dead, frac) =>
        (name, fam, path, c, p, m, kc, rows, dead, frac) }
      .toDF("collection", "family", "index_path", "n_centroids",
        "n_probe", "m", "k_codebook", "rows", "tombstones", "dead_fraction")
  }

  /** Reclaim superseded index artifacts from the cache roots
    * [[buildIndex]] publishes into ([[graft.ml.IndexCache.gc]] — every
    * mutate-then-rebuild cycle publishes a new content-keyed artifact;
    * this is the maintenance job that keeps the roots from growing by
    * one corpus-scale directory per cycle). `olderThanMs` (default 1 h)
    * is the shared-root race guard: artifacts untouched for at least
    * that long are eligible; live and append-base artifacts, paths a
    * live [[graft.plans.AnnIndexRegistry]] registration still
    * references, and staging dirs of still-running builders, are never
    * touched. Returns the removed paths. */
  def gcIndexCache(olderThanMs: Long = 3600000L,
      cacheRoot: String = graft.ml.IndexCache.DefaultIvfRoot,
      pqCacheRoot: String = graft.ml.IndexCache.DefaultIvfPqRoot)
      : Seq[String] = {
    val keep = graft.plans.AnnIndexRegistry.livePaths
    graft.ml.IndexCache.gc(cacheRoot, olderThanMs, keep) ++
      graft.ml.IndexCache.gc(pqCacheRoot, olderThanMs, keep)
  }

  /** A7 `RemoveItem` / B7 `RemoveAsync`. */
  def remove(name: String, key: String): Unit = removeBatch(name, Seq(key))

  /** A8 `RemoveEmptyKeys` — persisted purge (the scan-time purge happens in
    * [[getAll]] regardless, matching the reference's lazy behavior). */
  def removeEmptyKeys(name: String): Unit =
    if (collections.contains(name))
      collections(name) = purgeEmptyKeys(collections(name))

  // ---- kNN (B8, B9) ----

  // Collections with a registered ANN index: name -> parquet snapshot
  // path (the AnnIndexRegistry source key). See [[buildIndex]].
  private val indexedCollections = mutable.Map.empty[String, String]

  // Keys upserted since the collection's last snapshot dump (tracked
  // from the first buildIndex on): what [[syncDump]] reads to keep the
  // refresh APPEND-shaped. Presence of the name = a dump sync has
  // happened; the frame is reset to empty on every sync.
  private val pendingDumpKeys = mutable.Map.empty[String, DataFrame]

  // Content fingerprint of each dump dir as of THIS store's last sync
  // ([[graft.ml.IndexCache.sourceFingerprint]]): the incremental-dump
  // gate requires it to match the live dir before appending, so a dump
  // rewritten by ANOTHER store/process sharing the default dir +
  // collection name forces a full re-dump instead of extending a
  // foreign dump with this collection's rows (ADVICE r15 — the
  // pre-r15 unconditional overwrite was self-healing; this restores
  // that property without giving up the O(delta) path).
  private val dumpFingerprints = mutable.Map.empty[String, String]

  private def emptyKeyFrame: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("key", StringType))))

  // Collections RECORDED as carrying an ANN index, with the buildIndex
  // params that built them ((0, 0) = derived geometry). Distinct from
  // indexedCollections: a reloaded store knows which collections were
  // indexed (and at what operating point) even while the restart defers
  // the index job — so a plain load-then-save round-trip can never
  // erase the record, and a later rebuild restores the SAME geometry
  // the operator chose rather than silently re-deriving.
  private val recordedIndexes = mutable.Map.empty[String, (Int, Int)]

  /**
   * The index job for a collection — the scale path under B8: snapshot
   * the collection's (key, embedding) rows to parquet, build (or load)
   * the persisted IVF index over the snapshot, and register it with
   * [[graft.plans.AnnIndexRegistry]] so `getNearestMatches(useIndex =
   * true)` plans the nProbe-cell-pruned probe instead of a full corpus
   * scan. Explicitly a JOB, not a query-path side effect: at 100 TB this
   * is the maintenance task that runs on ingest cadence; re-run it after
   * mutations to refresh the searchable snapshot.
   *
   * The refresh is O(delta), not O(corpus) (VERDICT r14 ask #1): the
   * dump is APPEND-shaped. An insert-only mutation wave since the last
   * dump writes ONLY the new keys' rows as new parquet files — every
   * previously-dumped file stays byte-identical, so the content cache
   * sees a strict-superset manifest and the index job rides the
   * frozen-centroid append ([[graft.ml.IndexCache]] `growFrom` — no
   * KMeans re-fit; only the cheap nProbe sidecar recalibrates, and a
   * geometry-band crossing still rebuilds). Deletes need no dump write
   * at all — they already rode the tombstone sidecars at [[removeBatch]]
   * time, and an unchanged dump re-opens the same artifact, sidecars
   * intact. Only an UPDATE wave (a pending key that already exists in
   * the dump — including delete-then-re-upsert) forces the full
   * re-dump + rebuild, because a dump holding two embeddings for one
   * key could serve the stale one and an id-tombstone would kill both.
   * See [[syncDump]].
   */
  def buildIndex(name: String, nCentroids: Int = 0, nProbe: Int = 0,
      dir: String = sys.props("java.io.tmpdir") + "/graft-store-index"): Unit = {
    require(nCentroids >= 0 && nProbe >= 0 && (nCentroids > 0) == (nProbe > 0),
      "pass both nCentroids and nProbe (> 0), or neither " +
        "(0/0, the default = derive corpus-sized geometry)")
    val dump = s"$dir/${pathSafe(name)}"
    syncDump(name, dump,
      purgeEmptyKeys(current(name))
        .filter(col("embedding").isNotNull)
        .select(col("key"), col("embedding")))
    // default geometry is CORPUS-SIZED (sqrt-N cells, probe width
    // calibrated to recall@10 >= 0.95 — the reference's flagship top-k
    // shape) instead of a constant the collection outgrows; explicit
    // params remain for callers that tuned their own operating point
    // derived widths carry their contract's k into the registration so
    // the rewrite can over-probe proportionally when a caller asks for a
    // deeper top-k than the width was calibrated to serve; explicit
    // params are the caller's own operating point (servedK = 0, width
    // used verbatim at any k)
    val contract = graft.ml.IvfGeometry.FlagshipContract
    val ivf =
      if (nCentroids > 0) new graft.ml.IvfIndex(nCentroids, nProbe)
      else graft.ml.IvfGeometry.calibratedIvf(spark, dump, "key", "embedding",
        contract)
    // the shared index job builds the IVF-PQ sibling exactly when the
    // family-picking rewrite would serve the codes table (the
    // pqMinBytes conf both read); string keys ride it through the
    // surrogate-keyed artifact (openOrBuildPathAnyId's idMap). Derived
    // widths carry their contract's k so the rewrite can over-probe
    // deeper-than-contract queries; explicit params are the caller's
    // own operating point (servedK = 0, width used verbatim).
    graft.plans.AnnIndexRegistry.indexJob(spark, dump, "key", "embedding",
      ivf, servedK = if (nCentroids > 0) 0 else contract.k)
    indexedCollections(name) = dump
    recordedIndexes(name) = (nCentroids, nProbe)
    pendingDumpKeys(name) = emptyKeyFrame
  }

  /**
   * Bring the snapshot dump up to date with the live collection, writing
   * as little as the mutation history allows:
   *
   *  - first dump (or a new/foreign dump dir, or a dump with no success
   *    marker): full write;
   *  - pending keys all NEW (none in the dumped key set): append ONLY
   *    their rows as new files — the O(delta) path; previously-dumped
   *    files are untouched, so the content cache's manifest-subset check
   *    sees pure growth and the index appends against frozen centroids;
   *  - no pending keys (deletes-only cycle, or no mutations): no write —
   *    the unchanged dump resolves to the SAME published artifact, whose
   *    tombstone sidecars already carry the deletes;
   *  - any pending key already dumped (an update, or delete-then-
   *    re-upsert): full re-dump — correctness over cleverness, see
   *    [[buildIndex]].
   *
   * The update probe is one key-only semi-join (pending × dumped keys,
   * column-pruned scans); the delta is one anti-join on the same key
   * column. Neither touches embedding payloads of already-dumped rows.
   */
  private def syncDump(name: String, dump: String, live: DataFrame): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$dump/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the incremental gate requires the dump to be the one THIS store
    // last synced — markers/journals alone cannot detect a dump dir
    // rewritten by another store/process sharing the default dir and
    // collection name, and appending to a foreign dump would serve
    // another collection's rows (ADVICE r15). Fingerprint mismatch (or
    // cannot-compute) degrades to the self-healing full re-dump.
    val incremental = indexedCollections.get(name).contains(dump) &&
      pendingDumpKeys.contains(name) && fs.exists(marker) &&
      dumpFingerprints.get(name).exists(recorded =>
        scala.util.Try(graft.ml.IndexCache.sourceFingerprint(dump))
          .toOption.contains(recorded))
    def record(): Unit =
      dumpFingerprints(name) =
        scala.util.Try(graft.ml.IndexCache.sourceFingerprint(dump))
          .getOrElse("")
    if (!incremental) {
      live.write.mode("overwrite").parquet(dump)
      record()
      return
    }
    val pending = pendingDumpKeys(name).distinct().localCheckpoint()
    if (pending.isEmpty) return
    val dumpedKeys = spark.read.parquet(dump).select("key")
    val hasUpdates = pending.join(dumpedKeys, Seq("key"), "left_semi")
      .limit(1).count() > 0
    if (hasUpdates) {
      live.write.mode("overwrite").parquet(dump)
      record()
      return
    }
    // insert-only wave: every live key missing from the dump is pending-
    // new by construction (the only mutation paths are the journaled
    // upsert and the delete, which never adds keys)
    val delta = live.join(dumpedKeys, Seq("key"), "left_anti").localCheckpoint()
    if (!delta.isEmpty) { delta.write.mode("append").parquet(dump); record() }
  }

  /**
   * B8 `GetNearestMatchesAsync` — the flagship exact-kNN query
   * (MerkonMemoryStore.cs:117-150): cosine score, `>= minRelevanceScore`
   * filter (:138), descending top-k (:146). Plans as scan -> codegen'd
   * score -> TakeOrderedAndProject: per-partition top-k, only k rows per
   * partition cross the shuffle at any scale.
   *
   * `useIndex = true` (requires a prior [[buildIndex]]) serves the top-k
   * from the registered IVF index instead: the SAME declarative plan is
   * built over the indexed snapshot and [[graft.plans.AnnIndexRule]]
   * rewrites it into the cell-pruned probe — approximate with the recall
   * >= 0.9 contract (AnnRecallSpec / MerkonStoreSpec), reading
   * ~nProbe/nCentroids of the corpus. Scores of surfaced rows are exact.
   * The probe sees the collection as of the last buildIndex; metadata
   * and timestamp are fetched from the LIVE collection by key (a
   * broadcast join of <= limit rows), so a key deleted since the index
   * job yields a shorter result rather than a stale row.
   *
   * `predicate` (capability extension — the reference API has no filtered
   * search) restricts the result to records satisfying an arbitrary
   * Column predicate, with PRE-filter semantics on both paths: the
   * predicate cuts the candidate set before top-k, so it can never starve
   * the result below `limit` while allowed candidates exist, and no
   * out-of-slice row can surface. On the useIndex path the allow-list
   * semi-join sits between the index scan and the sort, a shape the
   * literal-query rewrite deliberately does not match — the search reads
   * the 2-column index dump (keys + embeddings, not the record table),
   * exact over the index snapshot. Carrying hot predicate columns INTO a
   * registered index (AnnIndexRegistry payloadCols, as
   * ann_indexed_filtered_rewrite does) is the cell-pruned 100 TB path
   * for high-QPS filtered search.
   */
  def getNearestMatches(
      name: String,
      queryVector: Array[Float],
      limit: Int,
      minRelevanceScore: Double = 0.0,
      withEmbeddings: Boolean = false,
      useIndex: Boolean = false,
      predicate: Option[Column] = None): DataFrame = {
    if (useIndex && limit > 0 && indexedCollections.contains(name)) {
      val idx = spark.read.parquet(indexedCollections(name))
      // pre-filter contract (the filtered-ANN convention, see
      // IvfIndex.searchFiltered): restrict candidates to keys whose LIVE
      // record satisfies the predicate BEFORE top-k, so a selective
      // predicate never starves the result below `limit` while allowed
      // candidates exist — and no out-of-slice row can ever surface.
      val candidates = predicate.fold(idx)(p => idx.join(
        purgeEmptyKeys(current(name)).filter(p).select("key"),
        Seq("key"), "left_semi"))
      val topk = candidates
        .withColumn("score", cosineSim(col("embedding"), lit(queryVector)))
        .filter(col("score") >= minRelevanceScore)
        .orderBy(col("score").desc, col("key").asc)
        .limit(limit)
        .select(col("key"), col("score"))
      val fetched = purgeEmptyKeys(current(name)).join(broadcast(topk), Seq("key"))
      return project(fetched, withEmbeddings)
        .orderBy(col("score").desc, col("key").asc)
    }
    val filtered = predicate.fold(purgeEmptyKeys(current(name)))(p =>
      purgeEmptyKeys(current(name)).filter(p))
    val base = project(
      filtered
        .withColumn("score", cosineSim(col("embedding"), lit(queryVector))),
      withEmbeddings)
    // limit <= 0 -> empty, matching MerkonMemoryStore.cs:125-128.
    if (limit <= 0) base.limit(0)
    else base
      .filter(col("score") >= minRelevanceScore)
      .orderBy(col("score").desc, col("key").asc)
      .limit(limit)
  }

  /**
   * The batch form of B8 (capability extension — the reference API is
   * call-per-query): top-k for EVERY row of a query TABLE (`q_id` LONG,
   * `q_emb` ARRAY<FLOAT>) against an indexed collection, through the
   * registered index — map-side centroid routing + one equi-join on
   * cell ([[graft.plans.AnnIndexRegistry.indexedKnnJoin]]), the
   * bulk-scoring shape a nightly pipeline runs instead of |Q| driver
   * round-trips. Requires a prior [[buildIndex]]. Tombstoned keys are
   * filtered inside the probe (full-k backfill); metadata and timestamp
   * come from the LIVE collection by key, so a key deleted since the
   * index job yields a shorter result, never a stale row. Returns
   * (q_id, rank, score, key, record columns), ordered (q_id, rank).
   *
   * `predicate` (VERDICT r15 ask #3 — the batch form of
   * [[getNearestMatches]]'s filtered search) restricts every query's
   * top-k to records whose LIVE row satisfies an arbitrary Column
   * predicate, with the same PRE-filter contract: the key allow-list
   * semi-joins the candidate side BEFORE scoring
   * ([[graft.plans.AnnIndexRegistry.indexedKnnJoin]]'s `allowedIds`),
   * so a selective slice never starves the result below k while
   * allowed candidates exist, and no out-of-slice row can surface —
   * "top-k within language / license / source slice" for a whole
   * query table at once. The probe over-probes 2× to compensate the
   * thinned cells (the registered single-query dial).
   */
  def getNearestMatchesBatch(name: String, queries: DataFrame, k: Int,
      withEmbeddings: Boolean = false,
      predicate: Option[Column] = None): DataFrame = {
    require(indexedCollections.contains(name),
      s"collection '$name' has no index — run buildIndex first " +
        "(the batch path is index-only; per-query exact search is " +
        "getNearestMatches)")
    // one filtered frame serves both sides: the allow-list that
    // pre-filters the probe and the record fetch after it
    val live = predicate.fold(purgeEmptyKeys(current(name)))(
      purgeEmptyKeys(current(name)).filter)
    val allow = predicate.map(_ => live.select("key"))
    val hits = graft.plans.AnnIndexRegistry.indexedKnnJoin(spark,
      indexedCollections(name), queries, k, allowedIds = allow)
      .select(col("q_id"), col("rank"),
        col("neighbor_id").as("key"), col("cos").as("score"))
    project(live.join(hits, Seq("key")), withEmbeddings)
      .orderBy(col("q_id"), col("rank"))
  }

  /** B9 `GetNearestMatchAsync` — top-1. */
  def getNearestMatch(
      name: String,
      queryVector: Array[Float],
      minRelevanceScore: Double = 0.0,
      withEmbedding: Boolean = false): DataFrame =
    getNearestMatches(name, queryVector, 1, minRelevanceScore, withEmbedding)

  // ---- Persistence (A10, A11 / B12) ----

  /** A11 `Save` — one parquet dir per collection + a `_collections` name
    * manifest (explicit checkpoint; never per-mutation). Collection data
    * lives under `$dir/collections/<urlencoded-name>` so arbitrary names
    * (including "_collections" or names with path separators) can never
    * collide with the manifest or escape the directory. */
  def save(dir: String, format: String = "parquet"): Unit = {
    import spark.implicits._
    collections.foreach { case (name, df) =>
      df.write.mode("overwrite").format(format)
        .save(s"$dir/collections/${pathSafe(name)}")
    }
    collections.keys.toSeq.toDF("name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_collections")
    // WHICH collections carry an ANN index — and at what buildIndex
    // operating point — is part of the store's state too. The RECORDED
    // set (not the in-memory bindings) is what persists: a store that
    // deferred its restart index job still knows its collections were
    // indexed, so load-then-save can never erase the record. Only names
    // + params go to disk: the artifacts are content-keyed in the shared
    // cache and the restart job rebuilds from the reloaded data, never
    // from a stale snapshot path.
    recordedIndexes.toSeq.collect {
      case (n, (c, p)) if collections.contains(n) => (n, c, p)
    }.toDF("name", "n_centroids", "n_probe")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_indexed")
  }

  /** A10 `Load`. Format must match the one used by [[save]]; json/csv need
    * the schema re-imposed since those formats don't carry types. Stores
    * saved before the "c-" prefixed encoding are still readable: when the
    * prefixed directory is absent we fall back to the legacy unprefixed
    * path (the prefix was a format break; the fallback keeps old stores
    * loadable without a version bump). Collection directories that
    * post-date the manifest — created through the SQL catalog face
    * ([[attachSqlCatalog]]'s `CREATE TABLE`) — are picked up too, so the
    * Scala facade and pure SQL observe one set of collections. */
  def load(dir: String, format: String = "parquet"): Unit =
    load(dir, format, rebuildIndexes = false)

  /** [[load]] plus the restart INDEX job: with `rebuildIndexes = true`,
    * every collection the saved store had run [[buildIndex]] on gets its
    * index job re-run after the data loads — at the RECORDED operating
    * point (an operator's explicit `(nCentroids, nProbe)` survives the
    * restart; derived-geometry collections re-derive) — so
    * `getNearestMatches(useIndex = true)` serves from the index across a
    * restart instead of silently falling back to the exact scan until an
    * operator remembers. Expect the job to pay its fits: the restart
    * re-dumps the snapshot, which re-keys the content cache. Opt-in for
    * exactly that reason — a caller restoring many stores batch-wise may
    * prefer to schedule the jobs itself; the `_indexed` record survives
    * a plain load-then-save round-trip either way. Collections recorded
    * as indexed but reloaded EMPTY of searchable vectors are skipped —
    * an index over nothing is not buildable, and the exact path serves
    * the empty result (the record is kept for when data returns). */
  def load(dir: String, format: String, rebuildIndexes: Boolean): Unit = {
    loadData(dir, format)
    indexedCollections.clear()
    recordedIndexes.clear()
    pendingDumpKeys.clear()
    dumpFingerprints.clear()
    val m = new org.apache.hadoop.fs.Path(s"$dir/_indexed")
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(m, "_SUCCESS")))
      spark.read.parquet(s"$dir/_indexed").collect().foreach { r =>
        val n = r.getString(0)
        if (collections.contains(n))
          recordedIndexes(n) = (r.getInt(1), r.getInt(2))
      }
    if (rebuildIndexes)
      recordedIndexes.toSeq.sortBy(_._1).foreach { case (n, (c, p)) =>
        if (current(n).filter(col("embedding").isNotNull &&
            graft.functions.VectorFunctions.l2Norm(col("embedding")) > 0)
            .limit(1).count() > 0)
          buildIndex(n, c, p)
      }
  }

  private def loadData(dir: String, format: String): Unit = {
    collections.clear()
    val names = spark.read.parquet(s"$dir/_collections")
      .collect().map(_.getString(0))
    val collRoot = new org.apache.hadoop.fs.Path(s"$dir/collections")
    val fs = collRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk =
      if (format == "parquet" && fs.exists(collRoot))
        fs.listStatus(collRoot).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("c-"))
          .map(st => java.net.URLDecoder.decode(
            st.getPath.getName.stripPrefix("c-"), "UTF-8"))
      else Seq.empty
    (names ++ onDisk.filterNot(names.contains)).foreach { n =>
      val path = collectionPath(dir, n)
      // A still-empty catalog-created collection (dir holding only the
      // _merkon_schema.json sidecar, no data files) would fail parquet
      // schema inference and break loading the ENTIRE store — bind it
      // as an empty frame with the sidecar's CREATE schema instead,
      // the same resolution MerkonCatalog.loadTable applies. A
      // manifest-listed collection whose directory is MISSING entirely
      // is the same failure class (one lost dir must not break loading
      // the whole store) FOR EVERY FORMAT: it takes the dataless branch
      // too, binding the sidecar schema when one survives and the record
      // schema otherwise. json/csv dirs that exist load through their
      // reader (the imposed schema makes an empty dir a valid empty
      // frame); only parquet needs the data-file check, because schema
      // inference over a dataless dir throws.
      val p = new org.apache.hadoop.fs.Path(path)
      val hasData = fs.exists(p) &&
        (format != "parquet" ||
          fs.listStatus(p).exists(st => st.isFile &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith(".")))
      collections(n) =
        if (hasData) {
          val reader = spark.read.format(format)
          val typed = if (format == "parquet") reader
                      else reader.schema(recordSchema)
          typed.load(path)
        } else {
          val sidecar = new org.apache.hadoop.fs.Path(p, "_merkon_schema.json")
          val schema =
            if (fs.exists(sidecar)) {
              val in = fs.open(sidecar)
              val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
              org.apache.spark.sql.types.DataType.fromJson(json)
                .asInstanceOf[org.apache.spark.sql.types.StructType]
            } else recordSchema
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        }
    }
  }

  /** Bind [[MerkonCatalog]] as `catalogName` over this store's [[save]]
    * layout at `saveDir`, making A1/A3/A5/A6 reachable from pure SQL
    * (`CREATE TABLE <cat>.<coll> ...`, `SHOW TABLES IN <cat>`,
    * `DROP TABLE <cat>.<coll>`) with full DSv2 parquet scans and
    * INSERTs on the same directories `save`/`load` use. Catalog confs
    * are read once at first resolution and the instance is cached per
    * session, so the FIRST binding of a name in a session wins. */
  def attachSqlCatalog(catalogName: String, saveDir: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$catalogName",
      classOf[MerkonCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalogName.warehouse",
      s"$saveDir/collections")
  }

  /** Import a database persisted by the REFERENCE ITSELF — the single
    * MessagePack `.bin` blob `MerkonDatabase.Save` writes
    * (MerkonDatabase.cs:149-162) — so an existing deployment's store
    * files load without a C#-side export step. The
    * [[graft.sources.MerkonLegacySource merkon-legacy]] DataSource V2
    * scans the blob (one partition per file; glob many stores for
    * fan-out) and this method layers the typed decode in plain Catalyst:
    * metadata via `from_json` against [[MerkonStore.metadataSchema]],
    * embedding via `from_json` to float array, timestamp via the "u"
    * round-trip codec (B11). Mirrors `Load` semantics: entries land
    * as stored — no key<-metadata.id override (that is an INGEST rule,
    * MerkonMemoryStore.cs:240, not a load rule) — and replace any
    * same-named in-memory collection. Returns the imported names. */
  def importLegacy(path: String): Seq[String] = {
    val raw = spark.read.format("merkon-legacy").load(path)
    val names = raw.select("collection").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    names.foreach { n =>
      collections(n) = raw
        .filter(col("collection") === n)
        .select(
          col("key"),
          from_json(col("metadata_string"), metadataSchema).as("metadata"),
          from_json(col("embedding_string"), ArrayType(FloatType)).as("embedding"),
          to_timestamp(col("timestamp_u"), UFormat).as("timestamp"))
    }
    names
  }

  /** Export the store AS the reference's on-disk format, so a migration
    * can run in both directions (`MerkonDatabase.Load` reads the result
    * byte-for-byte: 1-element object wrapper, collection map, 4-string
    * entries, nil for nulls). The format is by design one in-memory
    * blob (the reference materializes the whole dictionary to
    * serialize it, MerkonDatabase.cs:153), so this collects each
    * collection through the driver — an interop EXPORT for stores that
    * fit the reference's own memory model, not a data path; string
    * encoding (metadata/embedding JSON, "u" timestamps) happens
    * distributed, only finished strings land on the driver. */
  def exportLegacy(path: String): Unit = {
    val w = new graft.sources.MsgPack.Writer
    w.writeArrayHeader(1)
    w.writeMapHeader(collections.size)
    collections.keys.foreach { name =>
      val rows = encodeLegacyStrings(current(name)).collect()
      w.writeString(name)
      w.writeArrayHeader(rows.length)
      rows.foreach { r =>
        w.writeArrayHeader(4)
        var i = 0
        while (i < 4) { w.writeString(if (r.isNullAt(i)) null else r.getString(i)); i += 1 }
      }
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sessionState.newHadoopConf()).create(p, true)
    try out.write(w.toBytes) finally out.close()
  }

  /** recordSchema -> the reference's all-string `DatabaseEntry` fields. */
  private def encodeLegacyStrings(df: DataFrame): DataFrame = df.select(
    col("key"),
    to_json(col("metadata")).as("metadata_string"),
    when(col("embedding").isNotNull,
      concat(lit("["), array_join(col("embedding").cast(ArrayType(StringType)), ","), lit("]")))
      .as("embedding_string"),
    date_format(col("timestamp"), UFormat).as("timestamp_u"))

  /** Resolve a collection's on-disk dir, preferring the current prefixed
    * encoding and falling back to the pre-"c-" legacy layout. The legacy
    * candidate is never a special path component ("." / "..") — those
    * encodings are refused rather than resolved upward. */
  private def collectionPath(dir: String, name: String): String = {
    val preferred = new org.apache.hadoop.fs.Path(s"$dir/collections/${pathSafe(name)}")
    val fs = preferred.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(preferred)) preferred.toString
    else {
      val legacy = java.net.URLEncoder.encode(name, "UTF-8")
      require(legacy != "." && legacy != "..",
        s"refusing path-traversal collection name '$name' in legacy layout")
      val legacyPath = new org.apache.hadoop.fs.Path(s"$dir/collections/$legacy")
      if (fs.exists(legacyPath)) legacyPath.toString else preferred.toString
    }
  }

  /** Continuous ingest: upsert every micro-batch of a streaming source
    * into the collection (foreachBatch reuses the batch LWW upsert — the
    * unified-API path, so streaming ingest has exactly the batch
    * semantics, keyed per micro-batch arrival order). Micro-batches apply
    * sequentially on the stream execution thread; concurrent driver-side
    * mutation of the same collection is the caller's hazard, as with any
    * foreachBatch sink. */
  def streamingUpsert(
      name: String,
      records: DataFrame,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = records.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => upsertBatch(name, batch) }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  /** Truncate the union-of-upserts plan lineage without moving data to the
    * driver — including the indexed collection's pending-keys journal,
    * which grows one union node per upsert batch between [[buildIndex]]
    * runs just like the collection itself (r15 review: an upsert-heavy
    * steady state must be able to bound BOTH lineages with the one
    * documented maintenance call). The on-disk counterpart for a SAVED
    * collection is [[compactSaved]] — together they are the A11
    * replacement story. */
  def compact(name: String): Unit =
    if (collections.contains(name)) {
      collections(name) = collections(name).localCheckpoint()
      pendingDumpKeys.get(name).foreach(df =>
        pendingDumpKeys(name) = df.localCheckpoint())
    }

  /** Targeted small-file compaction of a SAVED collection directory —
    * the store-facade A11 replacement (VERDICT r10 ask #6): where the
    * reference rewrites the WHOLE database blob on every save
    * (MerkonDatabase.cs:149-162), this job rewrites ONLY the bins of
    * under-sized files that SQL-catalog `INSERT INTO` appends and
    * incremental saves accumulate, reusing the same integer bin-pack
    * skeleton `layout_compaction_apply` oracle-proves
    * ([[LayoutCompaction.assignBins]]).
    *
    * Mechanics: list real data files; files already >= `targetBytes`
    * are left untouched; the small ones are packed into cumulative-size
    * bins, each bin is rebuilt by exactly ONE task (repartition on the
    * bin key before a partitionBy write), the new files are moved in
    * and the originals deleted. One shuffle of only the small files'
    * rows — never a full-table rewrite. Not atomic vs concurrent
    * readers of the directory (a maintenance job's usual contract; the
    * swap window is delete-after-write so data is never absent, though
    * a reader planning mid-swap can see a bin twice). An in-memory
    * binding of `name` is re-pointed at the compacted directory.
    *
    * Returns (filesBefore, filesAfter) over data files. */
  def compactSaved(dir: String, name: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    import spark.implicits._
    val colDir = new org.apache.hadoop.fs.Path(collectionPath(dir, name))
    val fs = colDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles = fs.listStatus(colDir).toSeq.filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    val before = dataFiles
    val small = before.filter(_.getLen < targetBytes)
    if (small.size >= 2) {
      val manifest = small
        .map(st => (st.getPath.getName, st.getLen))
        .toDF("_file_name", "_bytes")
      val target = spark.range(1).select(lit(targetBytes).as("target"))
      val planned = LayoutCompaction
        .assignBins(manifest, Nil, Seq("_file_name"), "_bytes", target)
        .select(col("_file_name"), col("bin").as("_bin"))
        .localCheckpoint()
      // a singleton bin is already one file — rewriting it buys nothing
      val rewriteBins = planned.groupBy("_bin").agg(count(lit(1)).as("nf"))
        .filter(col("nf") > 1).select("_bin")
      val plan = planned.join(rewriteBins, Seq("_bin")).localCheckpoint()
      val files = plan.select("_file_name").as[String].collect()
      if (files.nonEmpty) {
        val frag = spark.read.parquet(
          files.map(f => new org.apache.hadoop.fs.Path(colDir, f).toString): _*)
        val dataCols = frag.columns.toSeq
        val tmp = new org.apache.hadoop.fs.Path(colDir, "_compact_tmp")
        frag.withColumn("_file_name", col("_metadata.file_name"))
          .join(broadcast(plan), Seq("_file_name"))
          .select((dataCols.map(col) :+ col("_bin")): _*)
          .repartition(col("_bin"))
          .write.partitionBy("_bin").mode("overwrite").parquet(tmp.toString)
        val runId = java.util.UUID.randomUUID().toString.take(8)
        // Hadoop FileSystem.rename signals failure by RETURNING FALSE,
        // not throwing — collect every move's outcome and only delete
        // the originals once all of them landed, or a failed bin's rows
        // silently vanish from the collection.
        val moves = fs.listStatus(tmp)
          .filter(_.getPath.getName.startsWith("_bin=")).flatMap { d =>
            val bin = d.getPath.getName.stripPrefix("_bin=")
            fs.listStatus(d.getPath)
              .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
              .zipWithIndex.map { case (f, i) =>
                val dest = new org.apache.hadoop.fs.Path(colDir,
                  s"compact-$runId-bin$bin-$i.parquet")
                (dest, fs.rename(f.getPath, dest))
              }
          }
        if (moves.forall(_._2)) {
          files.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(colDir, f), false))
          fs.delete(tmp, true)
          if (collections.contains(name))
            collections(name) = spark.read.parquet(colDir.toString)
        } else {
          // abort: pull back the moved-in compacted files (their rows
          // still live in the retained originals — leaving them would
          // DUPLICATE those bins), keep _compact_tmp for inspection.
          // fs.delete ALSO signals failure by returning false, so a
          // failed rollback must not hide behind an "originals retained"
          // message — name every compacted copy still sitting beside its
          // originals so the operator knows those bins read duplicated.
          val undeleted = moves.collect { case (dest, true) => dest }
            .filterNot(fs.delete(_, false))
          val rollbackState =
            if (undeleted.isEmpty) "originals retained"
            else "ROLLBACK INCOMPLETE — originals retained but these " +
              "compacted copies remain beside them (their bins read " +
              s"DUPLICATED until removed): ${undeleted.mkString(", ")}"
          throw new java.io.IOException(
            s"compactSaved: rename into $colDir failed for " +
              s"${moves.count(!_._2)} file(s); $rollbackState; " +
              s"${tmp} kept for inspection")
        }
      }
    }
    (before.size, dataFiles.size)
  }

  // ---- internals ----

  private def current(name: String): DataFrame =
    collections.getOrElse(name, emptyCollection)

  private def conform(df: DataFrame): DataFrame = {
    val cols = recordSchema.fields.map { f =>
      (if (df.columns.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private def keepLatest(df: DataFrame): DataFrame = {
    val withSeq = if (df.columns.contains(SeqCol)) df
                  else df.withColumn(SeqCol, lit(0L))
    val w = Window.partitionBy("key").orderBy(col(SeqCol).desc)
    withSeq
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", SeqCol)
  }

  private def purgeEmptyKeys(df: DataFrame): DataFrame =
    df.filter(length(coalesce(col("key"), lit(""))) > 0)

  private def project(df: DataFrame, withEmbeddings: Boolean): DataFrame =
    if (withEmbeddings) df else df.drop("embedding")
}

object MerkonStore {
  private val SeqCol = "_seq"

  /** Bijective path-safe encoding of a collection name. URL-encoding keeps
    * '/' and reserved characters inert, but does NOT encode dots — a bare
    * "." or ".." would resolve upward and clobber the store root — so every
    * encoded name carries a fixed "c-" prefix: the result can never equal
    * ".", "..", or any other special path component, and bijectivity is
    * preserved (fixed prefix + injective encode). */
  private[store] def pathSafe(name: String): String =
    "c-" + java.net.URLEncoder.encode(name, "UTF-8")

  /** Bijective SQL-identifier encoding: alphanumerics pass through, every
    * other character becomes `_<hex>_`. Distinct collection names can never
    * collide ('_' itself is escaped to `_5f_`), unlike a lossy mangle-to-'_'
    * which silently shadows one view with another. */
  private[store] def viewSafe(name: String): String =
    name.map {
      case c if c.isLetterOrDigit && c < 128 => c.toString
      case c => "_" + Integer.toHexString(c.toInt) + "_"
    }.mkString

  /** The reference's timestamp wire format — C# `DateTimeOffset.ToString
    * ("u")` (MerkonDatabase.cs:253): universal-sortable, second
    * precision, literal 'Z'. Same pattern the B11 codec query pins. */
  val UFormat = "yyyy-MM-dd HH:mm:ss'Z'"

  /** The reference's `MemoryRecordMetadata` JSON shape
    * (MerkonMemoryStore.cs:232,247) as a typed struct. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("is_reference", BooleanType),
    StructField("external_source_name", StringType),
    StructField("id", StringType),
    StructField("description", StringType),
    StructField("text", StringType),
    StructField("additional_metadata", StringType)))

  /** `DatabaseEntry` (MerkonDatabase.cs:243-254) with native types instead
    * of the reference's all-string fields. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("metadata", metadataSchema),
    StructField("embedding", ArrayType(FloatType)),
    StructField("timestamp", TimestampType)))
}

case class MemoryMetadata(
    is_reference: Boolean = false,
    external_source_name: String = null,
    id: String = null,
    description: String = null,
    text: String = null,
    additional_metadata: String = null)

case class MemoryRecord(
    key: String,
    metadata: MemoryMetadata,
    embedding: Array[Float],
    timestamp: java.sql.Timestamp = null)
