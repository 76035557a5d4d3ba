package graft.plans

import graft.functions.CosineSimilarity
import graft.ml.{IvfIndex, PqIndex}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, element_at, explode, lit, pmod, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}


/**
 * The engine-uses-its-own-indexes piece (SURVEY §4's one deliberately
 * deferred custom-optimizer item): a registered parquet corpus with a
 * persisted IVF index gets its flagship kNN pattern
 *
 *   scan → cosine_similarity(emb, <literal query>) → filter/orderBy →
 *   limit k
 *
 * rewritten by [[AnnIndexRule]] into the IVF probe: the query literal is
 * routed to its `nProbe` nearest cells at plan time (the centroid table
 * is a few KiB, held by the registry), and the corpus scan is replaced by
 * a scan of the index's cell-PARTITIONED `assigned` table pruned to the
 * probed cells — at 100 TB, `nProbe/nCentroids` of the corpus read
 * instead of all of it, with the exact scoring/ordering/limit semantics
 * of the original plan applied unchanged to the candidate set. No join is
 * needed where the streaming path (`VectorStreams.indexedKnn`) uses one:
 * a LITERAL query vector routes on the driver, so cell pruning becomes a
 * partition filter on the scan — earlier than any join could prune.
 *
 * Exactness contract: the rewrite is opt-in twice over — only explicitly
 * [[AnnIndexRegistry.register]]ed source paths ever match (registration
 * IS the index job), and the session kill-switch
 * `spark.graft.ann.rewrite.enabled` turns the rule into a no-op, leaving
 * the original exact plan. Results on a matched plan are approximate with
 * the AnnRecallSpec recall ≥ 0.9 contract (uniform-random worst case);
 * the oracle-checked exact kNN queries use a broadcast-join query-vector
 * shape (an attribute, not a literal) that can never match.
 *
 * Reference anchor: this serves the reference's flagship
 * `GetNearestMatchesAsync` shape (/root/reference/src/Connectors.Memory.
 * Merkon/MerkonMemoryStore.cs:117-150), which takes the query vector as a
 * call parameter — exactly the literal the rule keys on.
 */
object AnnIndexRegistry {

  /** A registered IVF-PQ artifact for the SAME corpus (optional second
    * family): where the published composite index lives, the PQ shape,
    * the per-subspace codebooks (collected once at registration — m × k
    * × dim/m doubles, a few hundred KiB at worst, same order as the
    * centroid routing table), and the corpus row count the cost rule
    * compares against the codes-table advantage point. A non-long-keyed
    * corpus's artifact is surrogate-keyed with a published idMap
    * ([[graft.ml.IvfPqIndex.openOrBuildPathAnyId]]); the serve path
    * detects it by the idMap's presence. */
  case class PqFamily(indexPath: String, m: Int, kCentroids: Int,
      codebooks: Map[(Int, Int), Array[Double]], corpusRows: Long)

  /** A registered index: where the published IVF artifact lives, how the
    * source columns map onto it, the routing table (collected once at
    * registration — nCentroids × dim floats), the metadata columns
    * carried in the index for FILTERED kNN plans (empty = only unfiltered
    * flagship plans are served), the top-k the registered probe width was
    * SIZED to serve (`servedK` — the k of the calibration contract's
    * query shape; 0 = unknown/caller-owned width, no k-scaling), the
    * content fingerprint of the source directory AT registration
    * (`sourceFp` — what [[lookupFresh]] re-checks before serving; "" =
    * legacy/unguarded entry), and — when the index job built one — the
    * IVF-PQ sibling [[AnnIndexRule]]'s cost rule may serve large corpora
    * from instead. */
  case class Entry(indexPath: String, idCol: String, embCol: String,
      nProbe: Int, centroids: Array[(Int, Array[Double])],
      payloadCols: Seq[String] = Seq.empty,
      pq: Option[PqFamily] = None,
      servedK: Int = 0,
      sourceFp: String = "")

  /** Driver-state bound: each entry pins nCentroids × dim doubles of
    * routing table (~1.5 MiB at 256×768). Registrations are unbounded
    * user input at many-corpora scale, so cap the cache LRU-wise — a
    * `lookup` refreshes recency, an over-cap `register` evicts the
    * least-recently-used entry. An evicted corpus silently falls back to
    * its exact scan (the rewrite is an optimization, never a semantic). */
  private[plans] val MaxEntries = 32

  // when each entry's sourceFp was last re-verified against the live
  // source dir (epoch ms) — the TTL cache behind lookupFresh. Guarded by
  // entries' monitor; evicted/removed entries drop their timestamp too.
  private val verifiedAt = scala.collection.mutable.Map.empty[String, Long]

  private val entries = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean = {
      val evict = this.size() > MaxEntries
      if (evict) verifiedAt.remove(e.getKey)
      evict
    }
  }

  /** Scheme-insensitive path key ("file:/x" and "/x" are the same scan). */
  private[plans] def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /**
   * The index job + registration: build (or load) the persisted IVF index
   * for `sourcePath` and register it so [[AnnIndexRule]] serves matching
   * kNN plans over that path from the index. Also installs the rule into
   * the session's extra optimizations (idempotent) — sessions configured
   * with `spark.sql.extensions=graft.GraftExtensions` already carry it.
   */
  def register(spark: SparkSession, ivf: IvfIndex, sourcePath: String,
      idCol: String, embCol: String, nProbe: Int,
      cacheRoot: String = graft.ml.IndexCache.DefaultIvfRoot,
      payloadCols: Seq[String] = Seq.empty,
      ivfpq: Option[graft.ml.IvfPqIndex] = None,
      pqCacheRoot: String = graft.ml.IndexCache.DefaultIvfPqRoot,
      servedK: Int = 0)
      : Entry = {
    val path = IvfIndex.openOrBuildPath(spark, ivf, sourcePath, idCol, embCol,
      cacheRoot)
    val centroids = loadCentroids(spark, path)
    if (payloadCols.nonEmpty) augment(spark, path, sourcePath, idCol, payloadCols)
    // the optional second family: build (or open) the composite artifact
    // in the same index job and record what the cost rule needs — the
    // codebooks for driver-side ADC table construction and the corpus
    // size for the advantage-point comparison
    val pqFam = ivfpq.map { q =>
      // both families must share the coarse quantizer (same cell count +
      // default seed -> same KMeans fit): the rule routes ONCE against
      // the registered centroid table and prunes either family's cell
      // directories with the same probed-cell set
      // cell-id COHERENCE requires both quantizers to be the same KMeans
      // fit — same cell count AND same seed; a seed mismatch would make
      // "cell 3" of the routing table a different region than cell=3 of
      // the codes table, silently collapsing recall on the served path
      require(q.nCentroids == ivf.nCentroids && q.seed == ivf.seed,
        s"IVF-PQ family must share the coarse quantizer: " +
          s"ivf=(${ivf.nCentroids} cells, seed ${ivf.seed}), " +
          s"ivfpq=(${q.nCentroids} cells, seed ${q.seed})")
      // AnyId: a non-long id column (the reference store's string keys)
      // gets a surrogate-keyed artifact + published idMap — the serve
      // path restores original ids after the shortlist fetch
      val pqPath = graft.ml.IvfPqIndex.openOrBuildPathAnyId(spark, q,
        sourcePath, idCol, embCol, pqCacheRoot)
      val cbs = spark.read.parquet(s"$pqPath/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      PqFamily(pqPath, q.m, q.kCentroids, cbs,
        spark.read.parquet(s"$path/assigned").count())
    }
    // fingerprint AFTER the artifact build: a source that changed while
    // the index job ran records the post-change state and the first
    // serve-time re-check catches the drift (deregister + exact scan).
    // Locality-aware (r17): a remote-scheme corpus records the bounded
    // Hadoop-listing signature instead of the blind local walk's
    // constant hash — the staleness guard now holds on object storage
    val fp = graft.ml.IndexCache.sourceSignature(
      spark.sparkContext.hadoopConfiguration, sourcePath)
    val entry = Entry(path, idCol, embCol, nProbe, centroids, payloadCols,
      pqFam, servedK, fp)
    put(sourcePath, entry)
    // persist the registration beside the artifact so a FRESH session's
    // flagship rides the index without a re-CALL (rehydrate); best-effort
    // — a read-only artifact root degrades to session-local registration
    // the record stores the ORIGINAL (scheme-qualified) source path so
    // rehydration/GC resolve the same FileSystem the registration did;
    // scheme-less local spellings are unchanged (normalize = identity)
    if (fp.nonEmpty) persistRegistration(sourcePath, entry)
    AnnIndexRule.install(spark)
    entry
  }

  private def loadCentroids(spark: SparkSession,
      indexPath: String): Array[(Int, Array[Double])] =
    spark.read.parquet(s"$indexPath/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  /**
   * Materialize the metadata-CARRYING index table for filtered kNN: the
   * cell table joined with the requested source columns, written
   * cell-partitioned next to `assigned`. This is the published
   * filtered-ANN storage layout — the predicate column lives IN the index
   * so a filtered probe is a pushed parquet filter on the pruned cells,
   * never a join back to the corpus at query time. Written once per
   * registration of a new index artifact (the publish dir changes whenever
   * the index is rebuilt or appended, so a stale sidecar can't be served);
   * idempotent when already present.
   */
  private def augment(spark: SparkSession, indexPath: String,
      sourcePath: String, idCol: String, payloadCols: Seq[String]): Unit = {
    // the cell table owns these spellings; a payload column shadowing one
    // would make the join/write ambiguous
    val reserved = Set("id", "emb", "cell", idCol)
    require(!payloadCols.exists(reserved.contains),
      s"payload columns may not shadow index columns: " +
        payloadCols.filter(reserved.contains).mkString(", "))
    val dest = s"$indexPath/augmented"
    val done = new org.apache.hadoop.fs.Path(s"$dest/_SUCCESS")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(done)) return
    val payload = spark.read.parquet(sourcePath)
      .select((idCol +: payloadCols).map(col): _*)
      .withColumnRenamed(idCol, "id")
    spark.read.parquet(s"$indexPath/assigned")
      .join(payload, Seq("id"))
      .write.mode("overwrite").partitionBy("cell").parquet(dest)
  }

  /**
   * The complete index JOB for a parquet corpus path: register `ivf`
   * (callers pass either a calibrated corpus-sized geometry or their own
   * operating point) and build the IVF-PQ sibling exactly when the
   * family-picking rewrite would serve the codes table — the same
   * [[AnnIndexRule.PqMinBytesKey]] conf the rule reads, so the job
   * builds what the optimizer will use and never pays the m KMeans fits
   * for an artifact the cost rule would ignore. Shared by
   * [[graft.store.MerkonStore.buildIndex]] and the SQL CALL surface
   * ([[graft.store.MerkonCatalog]]'s `build_index` procedure).
   */
  def indexJob(spark: SparkSession, sourcePath: String, idCol: String,
      embCol: String, ivf: IvfIndex, servedK: Int): Entry = {
    val corpus = spark.read.parquet(sourcePath)
    val n = corpus.count()
    val dim = corpus.filter(col(embCol).isNotNull)
      .select(org.apache.spark.sql.functions.size(col(embCol)))
      .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(0)
    val pqSibling =
      if (n == 0 || dim == 0) None
      else {
        val minBytes = AnnIndexRule.pqMinBytes(spark.conf.get(_, _))
        val m = graft.ml.IvfGeometry.subspacesFor(dim)
        if (n * dim.toLong * 4L >= minBytes && dim % m == 0)
          Some(new graft.ml.IvfPqIndex(ivf.nCentroids, ivf.nProbe, m = m,
            kCentroids = graft.ml.IvfGeometry.codebookFor(n)))
        else None
      }
    register(spark, ivf, sourcePath, idCol, embCol, ivf.nProbe,
      ivfpq = pqSibling, servedK = servedK)
  }

  /**
   * Batch query-TABLE kNN through the registered index (VERDICT r14 ask
   * #3) — the bulk-scoring shape an LLM pipeline runs nightly: N query
   * vectors as a DataFrame (`q_id` LONG, `q_emb` ARRAY<FLOAT>) against a
   * registered corpus. [[AnnIndexRule]] serves literal-query plans only
   * (one vector known at plan time); a query TABLE routes MAP-SIDE
   * instead — each query row fans out to its nProbe nearest cells with
   * the few-KiB centroid table in the task closure — and candidates
   * arrive through one EQUI-JOIN on `cell` against the cell-partitioned
   * index table: the batch form of
   * [[graft.streaming.VectorStreams.indexedKnn]], whose batch/stream
   * parity and recall contract VectorStreamsSpec/AnnRecallSpec pin.
   * Per query ~nProbe/nCentroids of the corpus is scored (exactly) and
   * reduced by the bounded partial-agg top-k; across a large query table
   * the union of probed cells approaches all cells, which is correct —
   * the equi-join still shuffles each query only to its own cells,
   * never |Q| × corpus. Tombstoned ids are filtered before scoring
   * (full-k backfill). `nProbe` 0 = the registered width, scaled by the
   * same dials the rewrite rule applies: ceil(p · k/servedK) for a k
   * deeper than the registered calibration contract (r16 — a single
   * calibrated cell cannot even fill a deeper top-k), capped at all
   * cells. A non-long
   * corpus id column (the reference store's STRING keys) rides a
   * deterministic xxhash64 surrogate through the long-keyed bounded
   * top-k aggregator — the same discipline as calibration and the
   * IVF-PQ AnyId artifact — with the original ids restored by one
   * equi-join on the surrogate afterwards (a 64-bit collision,
   * ~n²/2⁶⁵, could at worst let one extra row into a top-k; it can
   * never drop one). Throws on an unregistered path — this is an index
   * API, not a rewrite; callers own the fallback to the exact
   * `knn_join` spelling.
   *
   * `allowedIds` (VERDICT r15 ask #3) restricts every query's top-k to
   * an id allow-list — the metadata pre-filter contract every
   * single-query family honors ([[graft.ml.IvfIndex.searchFiltered]]):
   * the allow-list (the id projection of any metadata predicate)
   * SEMI-JOINS the candidate side BEFORE scoring, so a selective
   * predicate can never starve a query below k while allowed candidates
   * exist in the probed cells, and no out-of-slice row can surface.
   * "Top-k within language / license / source slice" is exactly the
   * nightly bulk-scoring shape. Over-probe compensates the thinned
   * cells: a filtered call with `nProbe` 0 probes 2× the registered
   * width (capped at all cells) — the same dial the threshold rewrite
   * uses; callers that know their selectivity pass an explicit width
   * (the published filtered-ANN practice: probe ≈ p/selectivity).
   */
  def indexedKnnJoin(spark: SparkSession, sourcePath: String,
      queries: DataFrame, k: Int, nProbe: Int = 0,
      allowedIds: Option[DataFrame] = None): DataFrame = {
    // the SAME serve-time guards as the rewrite rule: a stale
    // registration (in-place source rewrite) must not serve old rows
    // through the batch API either, and a fresh session's persisted
    // registration serves without a re-register
    val ttl = scala.util.Try(spark.conf.get(AnnIndexRule.StaleCheckMsKey,
      AnnIndexRule.DefaultStaleCheckMs.toString).toLong)
      .getOrElse(AnnIndexRule.DefaultStaleCheckMs)
    val e = lookupFresh(sourcePath, ttl).orElse(rehydrate(sourcePath))
      .getOrElse(throw new IllegalArgumentException(
        s"no current registered index for '$sourcePath' — run the index " +
          "job first (a registration whose source was rewritten in place " +
          "is deregistered rather than served stale)"))
    val built = IvfIndex.load(spark, e.indexPath)
    // the rewrite's probe dials, applied to the batch path too: a
    // filtered call doubles the width (thinned cells), and a k deeper
    // than the registered calibration contract (servedK) over-probes
    // proportionally — one calibrated cell of ~N/c rows cannot even
    // FILL a deeper top-k. Explicit nProbe = the caller's own width.
    val p =
      if (nProbe > 0) nProbe
      else {
        val base = if (allowedIds.isDefined) 2.0 * e.nProbe else e.nProbe.toDouble
        val k2k = if (e.servedK > 0 && k > e.servedK) k.toDouble / e.servedK else 1.0
        math.min(e.centroids.length, math.ceil(base * k2k).toInt)
      }
    def run(b: IvfIndex.Built, allow: Option[DataFrame]): DataFrame =
      allow.fold(graft.streaming.VectorStreams.indexedKnn(queries, b, p, k))(
        graft.streaming.VectorStreams.indexedKnnFiltered(queries, b, p, k, _))
    if (built.assigned.schema("id").dataType == LongType)
      run(built, allowedIds)
    else {
      val surrogate = built.copy(
        assigned = built.assigned.withColumn("id", xxhash64(col("id"))),
        tombstones = built.tombstones.map(
          _.withColumn("id", xxhash64(col("id")))))
      // restore map from the cell table itself (ids are unique by the
      // LWW invariant — no distinct needed); equi-join on the surrogate.
      // The allow-list rides the same surrogate mapping: the semi-join
      // against the candidate side happens in the xxhash64 key domain.
      val restore = built.assigned
        .select(col("id").as("_orig"), xxhash64(col("id")).as("neighbor_id"))
      run(surrogate,
        allowedIds.map(_.toDF("id").select(xxhash64(col("id")).as("id"))))
        .join(restore, Seq("neighbor_id"))
        .select(col("q_id"), col("rank"), col("_orig").as("neighbor_id"),
          col("cos"))
    }
  }

  /** Per-family index state of a registered corpus — the numbers the
    * compaction/GC cadence decisions read: (family, artifact path,
    * coarse geometry, PQ code shape when the family has one, live rows,
    * reclaimable tombstones, dead fraction). Tombstones are counted as
    * rows the sidecar would actually RECLAIM from that artifact
    * (semi-join in its own key domain) — a raw sidecar count
    * over-reports when it holds never-indexed ids. Row counts are
    * parquet-metadata reads. Empty for an unregistered path. Shared by
    * [[graft.store.MerkonStore.indexStats]] and the `index_stats` SQL
    * procedure. */
  def statsRows(spark: SparkSession, sourcePath: String)
      : Seq[(String, String, Int, Int, Option[Int], Option[Int], Long, Long, Double)] =
    lookup(sourcePath).toSeq.flatMap { entry =>
      def stat(family: String, path: String, table: String,
          m: Option[Int], kCodebook: Option[Int]) = {
        val t = spark.read.parquet(s"$path/$table")
        val total = t.count()
        val dead = IvfIndex.loadOptional(spark, s"$path/tombstones")
          .map(ts => t.join(ts.select(col("id")), Seq("id"), "left_semi")
            .count())
          .getOrElse(0L)
        (family, path, entry.centroids.length, entry.nProbe, m, kCodebook,
          total, dead, if (total == 0) 0.0 else dead.toDouble / total)
      }
      stat("ivf", entry.indexPath, "assigned", None, None) +:
        entry.pq.toSeq.map(f => stat("ivfpq", f.indexPath, "codedCell",
          Some(f.m), Some(f.kCentroids)))
    }

  /** Union `dead` into an artifact's id-tombstone sidecar (idempotent —
    * the merge is a distinct union). Materialized before the overwrite
    * because the union otherwise reads the directory the write is
    * replacing. O(|sidecar| + |batch|), never touches index tables. */
  private[graft] def mergeTombstones(spark: SparkSession, dir: String,
      dead: DataFrame): Unit = {
    val merged = IvfIndex.loadOptional(spark, dir)
      .fold(dead)(t => t.unionByName(dead)).distinct()
      .localCheckpoint()
    merged.coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Map registered-artifact tombstone ids into a PQ sibling's own key
    * domain: xxhash64 surrogates when the sibling artifact is
    * surrogate-keyed (detected by its published idMap, the same signal
    * the serve path uses), verbatim otherwise. */
  private[graft] def famDeadIds(spark: SparkSession, fam: PqFamily,
      dead: DataFrame): DataFrame =
    if (new java.io.File(s"${fam.indexPath}/idMap/_SUCCESS").isFile)
      dead.select(xxhash64(col("id")).as("id"))
    else dead.select(col("id"))

  /**
   * Family-aware physical compaction of a registered corpus's index
   * artifacts: fold each artifact's pending tombstones into its tables
   * and drop the sidecars ([[graft.ml.IvfIndex.compactOnDisk]] /
   * [[graft.ml.IvfPqIndex.compactOnDisk]] — only the affected cell/bucket
   * directories rewrite, no quantizer re-runs). Ordering is the
   * correctness: deletes written before the sibling existed (or by a
   * pre-dual-sidecar writer) live only in the REGISTERED artifact's
   * sidecar, so they are folded into the sibling's own sidecar FIRST and
   * the sibling compacts before the IVF artifact drops the shared record
   * — a crash between the two steps leaves both sidecars' deletes
   * intact, never resurrects a row. No-op for an unregistered path.
   */
  def compact(spark: SparkSession, sourcePath: String,
      minDeadFraction: Double = 0.0): Unit =
    lookup(sourcePath).foreach { entry =>
      entry.pq.foreach { fam =>
        IvfIndex.loadOptional(spark, s"${entry.indexPath}/tombstones")
          .foreach { t =>
            mergeTombstones(spark, s"${fam.indexPath}/tombstones",
              famDeadIds(spark, fam, t.select(col("id"))))
          }
        graft.ml.IvfPqIndex.compactOnDisk(spark, fam.indexPath,
          minDeadFraction)
      }
      IvfIndex.compactOnDisk(spark, entry.indexPath, minDeadFraction)
    }

  private[plans] def put(sourcePath: String, entry: Entry): Unit =
    entries.synchronized {
      val key = normalize(sourcePath)
      entries.put(key, entry)
      verifiedAt(key) = System.currentTimeMillis()
      // a fresh registration invalidates a cached rehydration MISS (a
      // pre-registration plan over the same path may have primed it)
      rehydrateMissAt.remove(key)
    }

  def lookup(path: String): Option[Entry] =
    entries.synchronized { Option(entries.get(normalize(path))) }

  /**
   * [[lookup]] plus the serve-time staleness guard (VERDICT r14 ask #2):
   * before an entry is served, its recorded source fingerprint is
   * re-checked against the live directory — a corpus REWRITTEN IN PLACE
   * without a re-register deregisters and falls back to the exact scan
   * instead of silently serving the old corpus's rows. The re-check is a
   * driver-side FS listing + head CRCs (the same
   * [[graft.ml.IndexCache.sourceFingerprint]] the cache keys on),
   * TTL-cached per entry (`ttlMs`; `spark.graft.ann.staleCheckMs` in the
   * rule, 0 = re-check every serve) so steady-state plans stay
   * listing-free. Legacy entries with no fingerprint ("" — e.g. a
   * non-local source dir the local fingerprint cannot see) serve
   * unguarded, preserving the documented MV-snapshot contract.
   */
  def lookupFresh(path: String, ttlMs: Long): Option[Entry] = {
    val key = normalize(path)
    val e = lookup(path).getOrElse(return None)
    if (e.sourceFp.isEmpty) return Some(e)
    val now = System.currentTimeMillis()
    val fresh = entries.synchronized {
      verifiedAt.get(key).exists(t => now - t >= 0 && now - t < ttlMs)
    }
    if (fresh) return Some(e)
    // re-check over the path AS PASSED — the rule passes the scan's own
    // root string, so a remote corpus re-signs through its own FileSystem
    scala.util.Try(graft.ml.IndexCache.sourceSignature(
      SparkSession.active.sparkContext.hadoopConfiguration, path)) match {
      case scala.util.Success(fp) if fp == e.sourceFp =>
        entries.synchronized { verifiedAt(key) = now }
        Some(e)
      case scala.util.Success(_) =>
        deregister(path)
        None
      // a fingerprint we could not COMPUTE (transient FS error, a
      // concurrent overwrite's delete-then-write window) fails closed
      // for THIS serve only — revoking durably on a cannot-know result
      // would turn a hiccup into a permanent fallback-to-exact
      case scala.util.Failure(_) => None
    }
  }

  // ---- persisted registrations (VERDICT r14 ask #4) ----
  //
  // The registry is driver-JVM state; without a durable record, a fresh
  // SQL session must re-CALL build_index before its flagship rides the
  // index. register() therefore drops a small line-based record INSIDE
  // the published artifact dir (URL-encoded values; atomic tmp+move like
  // the nprobe sidecar), and rehydrate() — called by the rule only after
  // a plan has matched the full ANN flagship shape over an unregistered
  // path — scans the default cache root for a record whose source AND
  // content fingerprint match the live directory, rebuilding the Entry
  // from the artifact's own tables. Staleness is structural: a record
  // whose fingerprint no longer matches is simply skipped, and the GC
  // reaps its artifact on the normal cadence.

  private val RegistrationRel = "registration.txt"

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  private def persistRegistration(sourceKey: String, entry: Entry): Unit =
    scala.util.Try {
      val lines = Seq(
        "v=1",
        s"source=${enc(sourceKey)}",
        s"idCol=${enc(entry.idCol)}",
        s"embCol=${enc(entry.embCol)}",
        s"nProbe=${entry.nProbe}",
        s"servedK=${entry.servedK}",
        s"sourceFp=${entry.sourceFp}",
        s"payloadCols=${entry.payloadCols.map(enc).mkString(",")}") ++
        entry.pq.toSeq.flatMap(f => Seq(
          s"pqPath=${enc(f.indexPath)}",
          s"pqM=${f.m}",
          s"pqK=${f.kCentroids}",
          s"pqRows=${f.corpusRows}"))
      val dir = new java.io.File(entry.indexPath)
      val tmp = java.io.File.createTempFile("registration", ".tmp", dir)
      java.nio.file.Files.write(tmp.toPath,
        lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp.toPath,
        new java.io.File(dir, RegistrationRel).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  private final case class Reg(source: String, idCol: String, embCol: String,
      nProbe: Int, servedK: Int, sourceFp: String, payloadCols: Seq[String],
      pq: Option[(String, Int, Int, Long)])

  private def readRegistration(artifactDir: java.io.File): Option[Reg] =
    scala.util.Try {
      val kv = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(artifactDir, RegistrationRel).toPath), "UTF-8")
        .split("\n").filter(_.contains("="))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
        .toMap
      require(kv.get("v").contains("1"))
      Reg(dec(kv("source")), dec(kv("idCol")), dec(kv("embCol")),
        kv("nProbe").toInt, kv("servedK").toInt, kv("sourceFp"),
        kv.get("payloadCols").filter(_.nonEmpty).toSeq
          .flatMap(_.split(",").toSeq.map(dec)),
        kv.get("pqPath").map(p =>
          (dec(p), kv("pqM").toInt, kv("pqK").toInt, kv("pqRows").toLong)))
    }.toOption

  // negative-result TTL cache: a rehydration miss costs a cache-root
  // listing + record reads, and plans over never-registered paths must
  // not pay that per optimizer invocation. LRU-bounded (keys are user
  // paths, unbounded input).
  private val rehydrateMissAt = new java.util.LinkedHashMap[String, Long](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Long]): Boolean =
      this.size() > 256
  }
  private[plans] val RehydrateMissTtlMs = 30000L

  /** Rebuild a registration for `path` from a persisted record in the
    * default cache root — served only when the record's content
    * fingerprint matches the LIVE source directory (a stale record can
    * never serve). None (and a TTL-cached miss) when no current record
    * exists; the caller falls back to the exact scan. Registrations made
    * against a custom cache root rehydrate only within their own session
    * (the scan covers the default root). */
  def rehydrate(path: String,
      roots: Seq[String] = Seq(graft.ml.IndexCache.DefaultIvfRoot)): Option[Entry] = {
    val key = normalize(path)
    val now = System.currentTimeMillis()
    entries.synchronized {
      if (Option(rehydrateMissAt.get(key))
          .exists(t => now - t >= 0 && now - t < RehydrateMissTtlMs))
        return None
    }
    def miss: Option[Entry] = {
      entries.synchronized { rehydrateMissAt.put(key, now) }
      None
    }
    // signature over the path AS PASSED (scheme-qualified for a remote
    // corpus — the same string register signed); records match on the
    // normalized form so pre-r17 stripped-path records stay valid
    val currentFp = scala.util.Try(graft.ml.IndexCache.sourceSignature(
      SparkSession.active.sparkContext.hadoopConfiguration, path))
      .getOrElse("")
    if (currentFp.isEmpty) return miss
    val candidates = roots.flatMap { root =>
      Option(new java.io.File(root).listFiles()).toSeq.flatten
        .filter(_.isDirectory)
        .flatMap { d =>
          val rec = new java.io.File(d, RegistrationRel)
          if (!rec.isFile) None
          else readRegistration(d)
            .filter(r => normalize(r.source) == key && r.sourceFp == currentFp)
            .map(r => (d, rec.lastModified(), r))
        }
    }
    // several current artifacts can exist for one source (different
    // geometries registered by different consumers) — latest registration
    // wins, matching the in-memory registry's last-put-wins semantics
    candidates.sortBy(-_._2).headOption match {
      case None => miss
      case Some((dir, _, r)) => scala.util.Try {
        require(new java.io.File(dir, "assigned/_SUCCESS").isFile,
          s"incomplete artifact at $dir")
        val spark = SparkSession.active
        val pqFam = r.pq.flatMap { case (p, m, kc, rows) =>
          if (!new java.io.File(s"$p/codedCell/_SUCCESS").isFile) None
          else Some(PqFamily(p, m, kc,
            spark.read.parquet(s"$p/codebooks").collect()
              .map(row => (row.getInt(0), row.getInt(1)) ->
                row.getSeq[Double](2).toArray).toMap,
            rows))
        }
        val entry = Entry(dir.getPath, r.idCol, r.embCol, r.nProbe,
          loadCentroids(spark, dir.getPath), r.payloadCols, pqFam,
          r.servedK, r.sourceFp)
        put(key, entry)
        entry
      }.toOption.orElse(miss)
    }
  }

  /** Remove a registration — DURABLY: the in-memory entry goes, and so
    * do any persisted records for this source in the default cache root,
    * so [[rehydrate]] cannot silently resurrect a registration an
    * operator explicitly revoked. (`clear()` stays session-local by
    * design — it is the JVM-state reset, not a revocation.) */
  def deregister(sourcePath: String): Unit = {
    val key = entries.synchronized {
      val k = normalize(sourcePath)
      entries.remove(k)
      verifiedAt.remove(k)
      k
    }
    scala.util.Try {
      Option(new java.io.File(graft.ml.IndexCache.DefaultIvfRoot).listFiles())
        .toSeq.flatten.filter(_.isDirectory)
        .foreach { d =>
          if (readRegistration(d).exists(r => normalize(r.source) == key))
            new java.io.File(d, RegistrationRel).delete()
        }
    }
  }

  def clear(): Unit = entries.synchronized {
    entries.clear()
    verifiedAt.clear()
    rehydrateMissAt.clear()
  }

  def size: Int = entries.synchronized { entries.size() }

  /** Every artifact path a live registration still references (IVF +
    * IVF-PQ sibling) — the set [[graft.ml.IndexCache.gc]] callers pass as
    * `keep` so a GC sweep can never reclaim a directory the next
    * index-served query in this session would read (ADVICE r14: a
    * stale-by-manifest artifact whose registration survives must fall
    * back at serve time, not throw missing-path at scan time). */
  def livePaths: Set[String] = entries.synchronized {
    import scala.jdk.CollectionConverters._
    entries.values().asScala
      .flatMap(e => e.indexPath +: e.pq.map(_.indexPath).toSeq).toSet
  }
}

/**
 * Logical rewrite `Limit(Sort(desc cosine_similarity(emb, literal), …,
 * Project/Filter chain, registered scan))` → same plan over the
 * cell-pruned index scan. The THRESHOLD-ONLY shape — no limit, but the
 * chain floors the same cosine at a literal (`score >= t` + sort, the
 * reference's `minRelevanceScore` path, MerkonMemoryStore.cs:138) — is
 * served too, with 2× over-probe since a floor query asks for a whole
 * neighborhood rather than a fixed k. See [[AnnIndexRegistry]] for the
 * contract.
 *
 * Shape requirements, checked structurally (anything else is left
 * untouched — the rule can only ever narrow a matched plan's candidate
 * set, never alter expressions):
 *  - the primary sort key resolves (through the chain's aliases) to
 *    `CosineSimilarity(<emb attribute>, <array literal>)` descending;
 *  - every relation attribute referenced anywhere in the matched chain
 *    is the registered id or embedding column (the index's `assigned`
 *    table only carries those two, so a plan touching other corpus
 *    columns keeps its exact scan);
 *  - the scan's root path is registered.
 */
object AnnIndexRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.ann.rewrite.enabled"

  /** Family-selection threshold (r14): when a registered corpus also
    * carries an IVF-PQ artifact and its raw embedding payload
    * (rows × dim × 4 bytes) is at least this large, the limit-k flagship
    * is served from the CODES table — probed cells stream m-byte codes
    * (32× less IO at the standard shape), the ADC shortlist bounds what
    * is fetched, and only shortlist embeddings are read for the exact
    * re-rank the untouched chain above performs. Below the threshold the
    * embedding scan fits executor cache and the extra shortlist hop
    * cannot win, so IVF keeps serving. Default 1 GiB — the order where a
    * probed cell's float payload stops being cache-resident; setting it
    * to 0 forces the PQ family (when registered), to Long.MaxValue
    * disables it — the same one-knob kill-switch shape as [[ConfKey]]. */
  val PqMinBytesKey = "spark.graft.ann.family.pqMinBytes"
  val DefaultPqMinBytes: Long = 1L << 30

  /** The one lenient parse of [[PqMinBytesKey]] (a malformed value must
    * never fail plan optimization or an index job — the pick is an
    * optimization, not a semantic), shared by the rule and
    * [[AnnIndexRegistry.indexJob]] so the job always builds exactly what
    * the rule will serve. `get` abstracts over the two conf surfaces
    * (SQLConf in the rule, session conf in the job). */
  private[graft] def pqMinBytes(get: (String, String) => String): Long =
    scala.util.Try(get(PqMinBytesKey, DefaultPqMinBytes.toString).toLong)
      .getOrElse(DefaultPqMinBytes)

  /** How long a registration's serve-time source re-check stays cached
    * ([[AnnIndexRegistry.lookupFresh]]): within the TTL a matched plan
    * serves without touching the filesystem; past it, one driver-side
    * listing re-verifies the corpus is still the one the index ingested.
    * 0 = re-verify on every serve (what the staleness specs set);
    * raising it trades detection latency for listing-free steady state.
    * Lenient parse — a malformed value must never fail optimization. */
  val StaleCheckMsKey = "spark.graft.ann.staleCheckMs"
  val DefaultStaleCheckMs = 10000L

  private def staleCheckMs: Long =
    scala.util.Try(
      conf.getConfString(StaleCheckMsKey, DefaultStaleCheckMs.toString).toLong)
      .getOrElse(DefaultStaleCheckMs)

  /** Idempotent session install (the runtime path; GraftExtensions is
    * the static-conf path). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(AnnIndexRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnIndexRule

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else plan.transformDown {
      case gl @ GlobalLimit(IntegerLiteral(k), LocalLimit(_, inner)) if k > 0 =>
        rewrite(inner, thresholdOnly = false, limitK = k).map { case (rel, replacement) =>
          gl.transformUp { case r if r eq rel => replacement }
        }.getOrElse(gl)
      // threshold-only flagship (the reference's minRelevanceScore path,
      // MerkonMemoryStore.cs:138 with limit defaulted away): no limit
      // anywhere, but the chain under the sort filters on the SAME cosine
      // against a literal floor — that filter bounds the result to the
      // high-similarity neighborhood the probed cells cover, so the plan
      // may ride the index (with over-probe; documented approximate). A
      // bare sorted-cosine scan without the floor never matches: a full
      // ranking of the corpus is not an ANN query.
      case s: Sort =>
        rewrite(s, thresholdOnly = true, limitK = 0).map { case (rel, replacement) =>
          s.transformUp { case r if r eq rel => replacement }
        }.getOrElse(s)
      // batch query-TABLE kNN (r16 ask #6): the naive bulk-scoring plan
      // — corpus × queries cross join, BARE cosine score, bounded
      // TopKByScore per query — served from the registered index via the
      // map-side centroid routing + ONE cell equi-join, exactly the
      // spelling [[AnnIndexRegistry.indexedKnnJoin]] offers as an API
      case agg: Aggregate =>
        rewriteKnnJoin(agg).getOrElse(agg)
    }

  /** Match Project*(Sort(Project/Filter*(relation))) under the limit (or
    * at `inner` itself for the threshold-only shape); return (matched
    * relation, replacement subtree) when every requirement holds.
    * Projects ABOVE the sort appear when the caller selects from the
    * top-k result (PushProjectionThroughLimit lands the pruning Project
    * between LocalLimit and Sort). */
  private def rewrite(inner: LogicalPlan, thresholdOnly: Boolean,
      limitK: Int): Option[(LogicalPlan, LogicalPlan)] = {
    // the subtree's OUTPUT is referencable by unseen operators above the
    // match (a select after the limit/sort) — any relation column that
    // escapes must be index-servable too, or the exact scan must stay
    var refs = AttributeSet(inner.output)
    var cur = inner
    var order: Seq[SortOrder] = null
    while (order == null) cur match {
      case p @ Project(_, c) =>
        refs ++= p.references; cur = c
      case Sort(o, true, c, _) =>
        refs ++= AttributeSet(o.flatMap(_.references)); order = o; cur = c
      case _ => return None
    }
    val child = cur
    // walk the Project/Filter chain down to a single relation, collecting
    // alias definitions, filter conditions, and every node's references
    var aliases = Map.empty[ExprId, Expression]
    var conds = Seq.empty[Expression]
    var rel: LogicalPlan = null
    var relOutput: Seq[Attribute] = null
    var rootPath: String = null
    cur = child
    while (rel == null) cur match {
      case p @ Project(projList, c) =>
        aliases ++= projList.collect { case a: Alias => a.exprId -> a.child }
        refs ++= p.references; cur = c
      case f @ Filter(cond, c) =>
        conds ++= splitConjuncts(cond); refs ++= f.references; cur = c
      case leaf if scanRoot(leaf).isDefined =>
        val (out, root) = scanRoot(leaf).get
        rel = leaf; relOutput = out; rootPath = root
      case _ => return None
    }
    val relOut = AttributeSet(relOutput)

    // the primary sort key must resolve to cosine(embAttr, literal) desc
    val head = order.headOption.getOrElse(return None)
    if (head.direction != Descending) return None
    val resolved = resolveThrough(head.child, aliases)
    val (embAttr, queryVec) = resolved match {
      case CosineSimilarity(a: AttributeReference, l: Literal)
          if relOut.contains(a) => (a, literalVec(l).getOrElse(return None))
      case CosineSimilarity(l: Literal, a: AttributeReference)
          if relOut.contains(a) => (a, literalVec(l).getOrElse(return None))
      case _ => return None
    }
    // registry resolution happens only after the plan is structurally a
    // literal-query ANN flagship: the staleness re-check (lookupFresh)
    // and the rehydration cache-root scan must never run for the vast
    // majority of limit/sort plans that could not be served anyway
    val entry = AnnIndexRegistry.lookupFresh(rootPath, staleCheckMs)
      .orElse(AnnIndexRegistry.rehydrate(rootPath))
      .getOrElse(return None)
    if (embAttr.name != entry.embCol) return None
    // threshold-only shape: some conjunct below the sort must floor the
    // SAME cosine at a literal (>= or >) — the bound that makes an
    // unlimited sorted scan an ANN query
    if (thresholdOnly && !conds.exists { c =>
      resolveThrough(c, aliases) match {
        case GreaterThanOrEqual(l, _: Literal) if l.semanticEquals(resolved) => true
        case GreaterThan(l, _: Literal) if l.semanticEquals(resolved) => true
        case LessThanOrEqual(_: Literal, r) if r.semanticEquals(resolved) => true
        case LessThan(_: Literal, r) if r.semanticEquals(resolved) => true
        case _ => false
      }
    }) return None
    // every relation column the chain touches must exist in the index
    // table (id + emb, plus the registered payload columns when the
    // metadata-carrying sidecar was materialized) — otherwise the exact
    // scan must stay. A FILTERED flagship plan (Filter on a payload
    // column under the sort) therefore rides the index iff the predicate
    // columns were registered; anything else falls back to exact.
    val relRefs = refs.filter(relOut.contains)
    val payload = entry.payloadCols.toSet
    if (!relRefs.forall(a => a.name == entry.idCol ||
        a.exprId == embAttr.exprId || payload.contains(a.name)))
      return None
    val needsPayload = relRefs.exists(a =>
      payload.contains(a.name) && a.name != entry.idCol &&
        a.exprId != embAttr.exprId)
    val idAttr = relOutput.find(_.name == entry.idCol).getOrElse(return None)

    // driver-side routing: nProbe nearest cells by cosine, ties cell-asc
    // (the same routing + tie-break as IvfIndex.search / indexedKnn).
    // The threshold shape OVER-PROBES (2× the registered nProbe, capped
    // at all cells): a floor query asks for the whole neighborhood above
    // t, not a fixed k, so the candidate set must reach further out —
    // the standard filtered/threshold-ANN compensation, recall ≥ 0.9 vs
    // the exact threshold scan pinned by AnnRewriteSpec.
    // The LIMIT shape scales the same dial with k: the registered width
    // was calibrated for a `servedK`-deep query (recall@servedK meets the
    // contract), and recall@k for k >> servedK needs candidates from
    // proportionally more cells — a single calibrated cell of ~N/c rows
    // cannot even FILL a top-k larger than itself. Proportional
    // over-probe capped at all cells keeps the contract transferable to
    // any requested k without recalibrating per query; unknown servedK
    // (0) keeps the registered width verbatim — the caller owns it.
    val k2k =
      if (thresholdOnly || entry.servedK <= 0 || limitK <= entry.servedK) 1.0
      else limitK.toDouble / entry.servedK
    val probeN =
      if (thresholdOnly) math.min(2 * entry.nProbe, entry.centroids.length)
      else math.min(entry.centroids.length,
        math.ceil(entry.nProbe * k2k).toInt)
    val cells = route(queryVec, entry.centroids, probeN)
    if (cells.isEmpty) return None

    // the replacement: cell-partition-pruned scan of the index table
    // (the metadata-carrying `augmented` table when the chain filters on
    // payload columns — the predicate stays in the untouched chain above
    // and becomes a pushed parquet filter on the probed cells),
    // tombstones filtered, renamed onto the ORIGINAL attribute ids so the
    // untouched chain above resolves unchanged
    val spark = SparkSession.active
    val table = if (needsPayload) "augmented" else "assigned"
    if (needsPayload && IvfIndex.loadOptional(spark,
        s"${entry.indexPath}/augmented").isEmpty) return None
    // FAMILY PICK (r14): serve the limit-k flagship from the IVF-PQ codes
    // table once the corpus's raw embedding bytes cross the configured
    // advantage point (see [[PqMinBytesKey]]); IVF keeps serving below
    // it, for payload-filtered plans (the augmented table is IVF-side),
    // and for the threshold shape (a floor query needs every row above
    // t — a bounded ADC shortlist cannot promise that neighborhood).
    // Non-long id columns serve through the surrogate-keyed artifact
    // (codes/fetch tables keyed by xxhash64(id), the published idMap
    // restores originals after the fetch). The candidate set swap is the
    // WHOLE difference — the untouched chain above rescores exactly
    // either way.
    val pqServed: Option[DataFrame] =
      if (thresholdOnly || needsPayload || limitK <= 0) None
      else entry.pq.flatMap { fam =>
        val dim = entry.centroids.headOption.map(_._2.length).getOrElse(0)
        val embBytes = fam.corpusRows * dim.toLong * 4L
        val minBytes = pqMinBytes(conf.getConfString(_, _))
        if (embBytes < minBytes) None
        else pqCandidates(spark, fam, cells, queryVec, limitK,
          longId = idAttr.dataType == LongType,
          ivfIndexPath = entry.indexPath)
      }
    lazy val ivfLive: Option[DataFrame] =
      prunedCellScan(spark, s"${entry.indexPath}/$table", cells).map { scan =>
        IvfIndex.loadOptional(spark, s"${entry.indexPath}/tombstones")
          .fold(scan)(t => scan.join(t, Seq("id"), "left_anti"))
      }
    val live = pqServed.orElse(ivfLive).getOrElse(return None)
    // index-table spelling of each referenced relation column
    val indexName: String => String = n =>
      if (n == entry.idCol) "id" else if (n == entry.embCol) "emb" else n
    val outAttrs = relOutput.filter(a => relRefs.contains(a) ||
      a.exprId == idAttr.exprId || a.exprId == embAttr.exprId)
    // splice the OPTIMIZED subtree, not the analyzed one: when the
    // session reads parquet through DSv2 (spark.sql.sources.useV1SourceList
    // excludes it), the index scan analyzes to a bare DataSourceV2Relation,
    // and the outer plan's pushdown phase — which converts those to
    // planner-ready scan relations — has ALREADY run by the time this
    // rule fires. Optimizing the subtree runs its own pushdown (this
    // rule cannot re-match it: no sort/limit shape), so the spliced
    // plan is executable under either reader
    val pruned = live
      .select(outAttrs.map(a => col(indexName(a.name)).as(a.name)): _*)
      .queryExecution.optimizedPlan
    val byName = pruned.output.map(o => o.name -> o).toMap
    Some((rel, Project(outAttrs.map(a =>
      Alias(byName(a.name), a.name)(exprId = a.exprId)), pruned)))
  }

  /**
   * The batch-kNN-join rewrite (VERDICT r16 ask #6): recognize the NAIVE
   * bulk-scoring plan
   *
   *   Aggregate(q_key, TopKByScore(k)(cosine(corpusEmb, queryEmb),
   *     corpusId), Project*(Join(no condition, corpus, queries)))
   *
   * over a REGISTERED corpus and swap the cross join's candidate set for
   * the cell-routed one: each query row fans out map-side to its nProbe
   * nearest cells (few-KiB centroid table in the task closure) and
   * candidates arrive through ONE equi-join on `cell` against the
   * cell-partitioned index table
   * ([[graft.streaming.VectorStreams.candidateRows]] — the same plan the
   * [[AnnIndexRegistry.indexedKnnJoin]] API builds). The aggregate and
   * every expression above the join are untouched: the original score
   * expression re-computes exactly over the narrowed set, so the swap
   * changes RECALL (the ≥ 0.9 AnnRecallSpec contract), never scores —
   * at 100 TB, |Q| × nProbe cells scored instead of |Q| × corpus.
   *
   * Soundness gates (anything else keeps the exact plan):
   *  - one grouping attribute (LONG), owned by the query side; exactly
   *    one aggregate — the TopKByScore over (BARE cosine, corpus id
   *    attribute). The bare-cosine requirement is the same intent signal
   *    the flagship match uses: the house EXACT spellings score through
   *    `round6`, so they can never match (`knn_join` stays the oracle-
   *    exact baseline; `ann_indexed_knn_join` spells the bare form);
   *  - only Projects between the aggregate and a condition-less
   *    inner/cross Join (a Filter could reference score or payload —
   *    declined), neither side streaming;
   *  - the corpus side walks through pure Projects to one registered
   *    scan touching only the registered id (LONG) and embedding
   *    columns; the query side is OPAQUE (evaluated as-is — any filter/
   *    subquery producing the query table rides along), contributing
   *    only the grouping key and an ARRAY<FLOAT> embedding;
   *  - probe width: the registered nProbe, over-probed ceil(p·k/servedK)
   *    for a k deeper than the registered calibration — the same dials
   *    as the API path.
   */
  private def rewriteKnnJoin(agg: Aggregate): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    // -- structural gates, cheapest first (this case sees EVERY Aggregate
    // in every plan: nothing below may touch the registry or a FS)
    val qKey = agg.groupingExpressions match {
      case Seq(a: AttributeReference) if a.dataType == LongType => a
      case _ => return None
    }
    // every output is a DETERMINISTIC expression whose embedded
    // aggregates are ALL TopKByScoreAgg (the optimizer pushes struct-
    // field extraction INTO the aggregate list — `topk_by_score(...).id
    // AS _extract_id` — so the aggregate may arrive wrapped, and a
    // consumer reading both .id and .score arrives as TWO copies of the
    // same aggregate) and whose attribute references OUTSIDE those
    // aggregates are the grouping key only. The wrappers stay above the
    // candidate swap untouched, so they evaluate identically over the
    // narrowed set.
    val topks = scala.collection.mutable.ArrayBuffer
      .empty[graft.functions.TopKByScoreAgg]
    agg.aggregateExpressions.foreach { ne =>
      if (!ne.deterministic) return None
      def scan(e: Expression): Boolean = e match {
        case AggregateExpression(t: graft.functions.TopKByScoreAgg, _,
            false, None, _) if !t.skipNulls =>
          topks += t; true
        case _: AggregateExpression => false
        case a: AttributeReference => a.exprId == qKey.exprId
        case other => other.children.forall(scan)
      }
      if (!scan(ne)) return None
    }
    if (topks.isEmpty) return None
    val sa = topks.head
    val k = topks.map(_.kValue).max
    // walk Projects down to the condition-less join, collecting aliases
    var aliases = Map.empty[ExprId, Expression]
    var refs = AttributeSet(agg.references.toSeq)
    var cur = agg.child
    var join: Join = null
    while (join == null) cur match {
      case p @ Project(list, c) =>
        aliases ++= list.collect { case al: Alias => al.exprId -> al.child }
        refs ++= p.references; cur = c
      case j: Join if j.condition.isEmpty &&
          (j.joinType == org.apache.spark.sql.catalyst.plans.Inner ||
            j.joinType == org.apache.spark.sql.catalyst.plans.Cross) &&
          !j.left.isStreaming && !j.right.isStreaming => join = j
      case _ => return None
    }
    // the score must resolve to a BARE cosine over one attribute from
    // each side; the id to a corpus-side attribute
    val (corpusEmb, queryEmb) =
      resolveThrough(sa.children.head, aliases) match {
        case CosineSimilarity(a: AttributeReference, b: AttributeReference) =>
          if (join.left.outputSet.contains(a) == join.left.outputSet.contains(b))
            return None
          (a, b)
        case _ => return None
      }
    val corpusId = resolveThrough(sa.children(1), aliases) match {
      case a: AttributeReference if a.dataType == LongType => a
      case _ => return None
    }
    // every TopKByScore in the output list must rank the SAME
    // (score, id) pair — duplicated copies from field extraction do;
    // a second top-k over a different score would need its own routing
    if (!topks.forall(t =>
        resolveThrough(t.children.head, aliases)
          .semanticEquals(resolveThrough(sa.children.head, aliases)) &&
        resolveThrough(t.children(1), aliases)
          .semanticEquals(corpusId))) return None
    // orient: the corpus side owns (emb, id); the query side owns
    // (grouping key, query emb)
    val corpusLeft = join.left.outputSet.contains(corpusEmb)
    val (corpusPlan, queryPlan) =
      if (corpusLeft) (join.left, join.right) else (join.right, join.left)
    if (!corpusPlan.outputSet.contains(corpusId) ||
      !queryPlan.outputSet.contains(qKey) ||
      !queryPlan.outputSet.contains(queryEmb) ||
      corpusEmb.exprId == queryEmb.exprId) return None
    if (!queryEmb.dataType.isInstanceOf[ArrayType] ||
      queryEmb.dataType.asInstanceOf[ArrayType].elementType != FloatType)
      return None
    // nothing above the join may reference any OTHER join output
    val allowed = Set(qKey.exprId, queryEmb.exprId, corpusId.exprId,
      corpusEmb.exprId)
    if (!refs.filter(join.outputSet.contains)
        .forall(a => allowed.contains(a.exprId))) return None
    // corpus side: pure Projects down to one registered scan, touching
    // only the registered id/emb columns
    var cAliases = Map.empty[ExprId, Expression]
    var cRefs = AttributeSet(Seq(corpusEmb, corpusId))
    cur = corpusPlan
    var rel: LogicalPlan = null
    var relOutput: Seq[Attribute] = null
    var rootPath: String = null
    while (rel == null) cur match {
      case p @ Project(list, c) =>
        cAliases ++= list.collect { case al: Alias => al.exprId -> al.child }
        cRefs ++= p.references; cur = c
      case leaf if scanRoot(leaf).isDefined =>
        val (out, root) = scanRoot(leaf).get
        rel = leaf; relOutput = out; rootPath = root
      case _ => return None
    }
    val relEmb = resolveThrough(corpusEmb, cAliases) match {
      case a: AttributeReference => a
      case _ => return None
    }
    val relId = resolveThrough(corpusId, cAliases) match {
      case a: AttributeReference => a
      case _ => return None
    }
    val relOut = AttributeSet(relOutput)
    if (!cRefs.filter(relOut.contains).forall(a =>
        a.exprId == relEmb.exprId || a.exprId == relId.exprId)) return None
    // -- structural match complete; registry resolution only now
    val entry = AnnIndexRegistry.lookupFresh(rootPath, staleCheckMs)
      .orElse(AnnIndexRegistry.rehydrate(rootPath))
      .getOrElse(return None)
    if (relEmb.name != entry.embCol || relId.name != entry.idCol) return None
    val spark = SparkSession.active
    val built = scala.util.Try(IvfIndex.load(spark, entry.indexPath))
      .getOrElse(return None)
    // non-long corpus keys serve through the API's surrogate mapping,
    // not the rule (the naive spelling's TopKByScore is long-keyed
    // already, so a matched plan is long-keyed by construction)
    if (built.assigned.schema("id").dataType != LongType) return None
    val k2k =
      if (entry.servedK > 0 && k > entry.servedK) k.toDouble / entry.servedK
      else 1.0
    val p = math.min(entry.centroids.length,
      math.ceil(entry.nProbe * k2k).toInt)
    // the replacement: query side evaluated AS-IS under canonical names,
    // routed map-side, one equi-join on cell — then the four attrs the
    // plan above references, bound back onto their original exprIds
    val qPlan = Project(Seq(
      Alias(qKey, "q_id")(), Alias(queryEmb, "q_emb")()), queryPlan)
    val qdf = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, qPlan)
    val cand = graft.streaming.VectorStreams.candidateRows(qdf, built, p)
    // optimize the subtree now (same reasoning as the flagship splice:
    // the outer plan's pushdown phase has already run)
    val pruned = cand.queryExecution.optimizedPlan
    val orig = Map("q_id" -> qKey, "q_emb" -> queryEmb,
      "id" -> corpusId, "emb" -> corpusEmb)
    val projList = pruned.output.map { o =>
      val a = orig(o.name)
      Alias(o, a.name)(exprId = a.exprId)
    }
    Some(agg.transformUp { case j if j eq join => Project(projList, pruned) })
  }

  /**
   * Scan ONLY the probed cell directories of a cell-partitioned index
   * table (`basePath` keeps the `cell` partition column in the schema).
   * The probed set is known on the driver at plan time, so the file
   * listing touches p directories instead of all nCentroids — at a
   * 32,768-cell 100 TB corpus serving p=16 probes, a ~2000× smaller
   * listing per query; measurable at fixture scale too (FamilyBench
   * r14: the per-query IVF serve cost grew with the CELL COUNT, not the
   * corpus, when the scan listed the whole table). A probed cell that
   * never received rows — or whose directory a fully-dead compaction
   * removed — simply isn't read; None (caller falls back to the exact
   * scan) when no probed directory exists at all.
   */
  private def prunedCellScan(spark: SparkSession, tablePath: String,
      cells: Seq[Int]): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = cells.map(c => s"$tablePath/cell=$c")
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", tablePath).parquet(dirs: _*))
  }

  /** Flatten a filter condition into its AND-conjuncts. */
  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Substitute chain aliases into `e` to a fixpoint (the sort usually
    * keys on a projected `score` alias, often through round6 — only a
    * BARE cosine survives the match below, by design: a transformed
    * score orders differently than raw cosine only in ties, but a
    * transformed SHAPE signals a query we did not reason about). */
  private def resolveThrough(e: Expression, aliases: Map[ExprId, Expression]): Expression = {
    var cur = e
    var i = 0
    while (i < 8) { // alias chains are shallow; bound the walk
      val next = cur.transformUp {
        case a: AttributeReference if aliases.contains(a.exprId) => aliases(a.exprId)
      }
      if (next fastEquals cur) return cur
      cur = next; i += 1
    }
    cur
  }

  /**
   * The scan leaves the rule can serve, with their output attributes and
   * single root path: the V1 parquet relation (`spark.read.parquet` /
   * temp views over paths — the original surface), and the DSv2 file
   * scans the SQL catalog face produces ([[graft.store.MerkonCatalog]]'s
   * `ParquetTable`): `DataSourceV2Relation` when the rule runs from the
   * extensions' operator-optimization batch (before V2 pushdown) and
   * `DataSourceV2ScanRelation` when it runs from
   * `experimental.extraOptimizations` (after). Multi-root scans are
   * never served — the registration key is one corpus directory.
   */
  private def scanRoot(p: LogicalPlan): Option[(Seq[Attribute], String)] = {
    import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, FileScan, FileTable}
    val roots: Option[Seq[org.apache.hadoop.fs.Path]] = p match {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        Some(lr.relation.asInstanceOf[HadoopFsRelation].location.rootPaths)
      case r: DataSourceV2Relation => r.table match {
        case ft: FileTable => Some(ft.fileIndex.rootPaths)
        case _ => None
      }
      case sr: DataSourceV2ScanRelation => sr.scan match {
        // a post-pushdown scan may have CONSUMED predicates out of the
        // logical plan (V2ScanRelationPushDown folds a partition filter
        // into FileScan.partitionFilters and removes the Filter node) —
        // the chain walker can no longer see them, so serving such a
        // scan would swap in the UNFILTERED index and return rows the
        // query filtered out. Only a pristine scan is servable.
        case fs: FileScan
            if fs.partitionFilters.isEmpty && fs.dataFilters.isEmpty =>
          Some(fs.fileIndex.rootPaths)
        case _ => None
      }
      case _ => None
    }
    roots.collect { case Seq(one) => (p.output, one.toString) }
  }

  /** Array literal → double vector (float32 and float64 corpora). */
  private def literalVec(l: Literal): Option[Array[Double]] = l.dataType match {
    case ArrayType(FloatType, _) =>
      Option(l.value).map(_.asInstanceOf[ArrayData].toFloatArray.map(_.toDouble))
    case ArrayType(DoubleType, _) =>
      Option(l.value).map(_.asInstanceOf[ArrayData].toDoubleArray)
    case _ => None
  }

  /**
   * The IVF-PQ candidate set for a literal query: scan ONLY the probed
   * cells of the codes table (m bytes/row instead of 4·dim), score with
   * the driver-built ADC lookup table (the same per-subspace
   * squared-distance table [[graft.ml.PqIndex]] builds per query row —
   * one literal query means ONE table, inlined into the plan), keep a
   * bounded shortlist via the partial-agg top-k, and fetch ONLY the
   * shortlist's embeddings from the id-bucketed fetch table. The chain
   * above the swapped relation re-scores the fetched rows with exact
   * cosine and applies the original sort/limit — that IS the PQ re-rank,
   * expressed by the user's own plan. A non-long id corpus (`longId =
   * false`) is served from the surrogate-keyed artifact
   * ([[graft.ml.IvfPqIndex.openOrBuildPathAnyId]]): every index table
   * carries xxhash64(id), and the final step joins the published idMap
   * on (bucket, sid) — partition-pruned to the shortlist's buckets — to
   * restore the original ids the plan above expects. Returns None (IVF
   * serves) when the artifact is unreadable or the query/codebook shapes
   * disagree — the pick is an optimization, never a semantic.
   */
  private def pqCandidates(spark: SparkSession, fam: AnnIndexRegistry.PqFamily,
      cells: Seq[Int], queryVec: Array[Double], k: Int,
      longId: Boolean, ivfIndexPath: String): Option[DataFrame] = {
    val qn = math.sqrt(queryVec.map(x => x * x).sum)
    if (qn == 0.0) return None
    val unit = queryVec.map(_ / qn)
    val d = unit.length / fam.m
    if (d * fam.m != unit.length ||
        !fam.codebooks.get((0, 0)).exists(_.length == d)) return None
    if (!new java.io.File(s"${fam.indexPath}/codedCell/_SUCCESS").isFile)
      return None
    if (!longId &&
        !new java.io.File(s"${fam.indexPath}/idMap/_SUCCESS").isFile)
      return None
    // ADC lookup table, driver-side: tab(sub*k + c) = |q_sub - cent|²
    val tab = Array.tabulate(fam.m * fam.kCentroids) { i =>
      val sub = i / fam.kCentroids
      val cent = fam.codebooks((sub, i % fam.kCentroids))
      var dist = 0.0
      var j = 0
      while (j < d) {
        val diff = unit(sub * d + j) - cent(j); dist += diff * diff; j += 1
      }
      dist
    }
    val scan = prunedCellScan(spark, s"${fam.indexPath}/codedCell", cells)
      .getOrElse(return None)
    val famLive = IvfIndex.loadOptional(spark, s"${fam.indexPath}/tombstones")
      .fold(scan)(t => scan.join(t, Seq("id"), "left_anti"))
    // deletes land in the REGISTERED artifact's tombstone sidecar (the
    // store's remove path writes `${entry.indexPath}/tombstones` with
    // ORIGINAL ids) — the codes-table serve must honor them too, and
    // BEFORE the shortlist so a dead row can never occupy a top-k slot
    // and truncate the backfilled result. Surrogate-keyed artifacts map
    // the tombstoned ids into the xxhash64 domain the codes are keyed in.
    val live = IvfIndex.loadOptional(spark, s"$ivfIndexPath/tombstones")
      .fold(famLive) { t =>
        val dead =
          if (longId) t.select(col("id"))
          else t.select(xxhash64(col("id")).as("id"))
        famLive.join(dead, Seq("id"), "left_anti")
      }
    val adc = (0 until fam.m).map(sub =>
      element_at(lit(tab), lit(sub * fam.kCentroids) +
        element_at(col("codes"), sub + 1) + 1)).reduce(_ + _)
    // shortlist sized for the re-rank above it: 8×k with a floor scaled
    // to codebook fidelity ([[graft.ml.IvfGeometry.shortlistFor]] — a
    // 4-bit fixture codebook needs a proportionally deeper buffer to
    // hold the recall contract; 192 at the production 8-bit width)
    val shortN = graft.ml.IvfGeometry.shortlistFor(fam.kCentroids, k)
    val shortlist = live
      .select(lit(0L).as("q"), col("id"), (-adc).as("neg_dist"))
      .groupBy(col("q"))
      .agg(graft.functions.TopKByScore(shortN)(col("neg_dist"), col("id"))
        .as("cand"))
      .select(explode(col("cand.id")).as("id"))
      .select(pmod(col("id"), lit(PqIndex.EmbBuckets)).cast("int").as("bucket"),
        col("id"))
    val emb = spark.read.parquet(s"${fam.indexPath}/embById")
      .select(col("bucket").cast("int").as("bucket"), col("id"), col("emb"))
    val fetched = emb.join(shortlist, Seq("bucket", "id"), "left_semi")
      .select(col("id"), col("emb"))
    if (longId) Some(fetched)
    else {
      // surrogate-keyed artifact: `id` here is xxhash64(original). The
      // idMap restore joins on (bucket, sid) so the bucket-partitioned
      // map scan prunes to the shortlist's own buckets, exactly like the
      // embedding fetch above — never a full-corpus map scan.
      val idMap = spark.read.parquet(s"${fam.indexPath}/idMap")
        .select(col("bucket").cast("int").as("bucket"), col("sid"), col("id"))
      Some(fetched
        .select(pmod(col("id"), lit(PqIndex.EmbBuckets)).cast("int")
          .as("bucket"), col("id").as("sid"), col("emb"))
        .join(idMap, Seq("bucket", "sid"))
        .select(col("id"), col("emb")))
    }
  }

  private def route(q: Array[Double], centroids: Array[(Int, Array[Double])],
      nProbe: Int): Seq[Int] = {
    val nq = math.sqrt(q.map(x => x * x).sum)
    if (nq == 0.0) return Seq.empty
    centroids.map { case (cell, c) =>
      var dot = 0.0; var nc = 0.0; var i = 0
      while (i < c.length && i < q.length) {
        dot += q(i) * c(i); nc += c(i) * c(i); i += 1
      }
      (cell, if (nc == 0.0) -1.0 else dot / (nq * math.sqrt(nc)))
    }.sortBy { case (cell, s) => (-s, cell) }.take(nProbe).map(_._1).toSeq
  }
}
