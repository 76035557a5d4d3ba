package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.DecimalType

/**
 * Aggregate navigation — the second registered-artifact optimizer rule
 * next to [[AnnIndexRule]]: a fact table with a REGISTERED rollup
 * (pre-aggregated on a dim set, COUNT + exact-DECIMAL SUM measures) gets
 * its matching aggregation plans
 *
 *   Aggregate(dims' ⊆ dims, count(1) / sum(CAST(measure AS DEC(18,3))),
 *     [Filter on dims] scan(fact))
 *
 * rewritten to re-aggregate the (tiny) rollup table instead of scanning
 * the fact: count(1) becomes sum(_cnt), each decimal sum becomes
 * sum(_sum_<m>) cast back to the original result type, min/max over a
 * raw measure become min(_min_<m>)/max(_max_<m>), the exact-decimal avg
 * becomes sum(_sum_<m>)/sum(_cnt) at Spark's own Average types, and dim
 * filters remap onto the rollup's columns. At 100 TB this is the
 * BI-engine move
 * (Calcite's materialized-view navigation): a dashboard's GROUP BY reads
 * kilobytes of cells, not the fact — and because COUNT and DECIMAL SUM
 * are exactly re-aggregable (order-free), the rewrite is EXACT, not
 * approximate; the oracle hash over the rewritten query proves it.
 *
 * Soundness gates (anything else keeps its exact plan):
 *  - only explicitly registered fact paths match;
 *  - grouping keys are plain dim attributes (subset of the rollup dims);
 *  - every filter conjunct is DETERMINISTIC and references dim columns
 *    only (a nondeterministic conjunct — e.g. rand() sampling — would
 *    re-evaluate per pre-aggregated cell instead of per fact row);
 *  - aggregates are exactly count(1) (non-distinct, non-null literal —
 *    count(NULL) counts zero and must not become the group size),
 *    sum/avg(CAST(m AS DECIMAL(18,3))) over a registered measure — the
 *    house exact spelling; a raw double sum/avg is NOT re-aggregable
 *    from partials and never matches — or min/max over the raw measure
 *    (exact for any orderable type, no decimal discipline needed);
 *    output expressions may wrap those aggregates in any DETERMINISTIC
 *    scalar computation (sum/count, max - min, count·k, casts) — the
 *    aggregates re-aggregate value-identically and the scalar structure
 *    is preserved verbatim, so the wrapper evaluates identically;
 *  - projects in the chain are pure column pruning.
 * Kill switch: `spark.graft.rollup.rewrite.enabled` = false.
 */
object RollupRegistry {

  /** `sourceSig` is the fact's data-file signature AT registration —
    * what [[lookupFresh]] re-checks before the rule claims exactness
    * over the pre-aggregated cells ("" = legacy/unguarded entry). */
  case class Entry(rollupPath: String, dims: Seq[String],
      measures: Seq[String], sourceSig: String = "")

  // MULTIPLE rollups per fact (r17): a real BI deployment registers
  // several dim sets over one fact table (daily dashboard on (status),
  // drill-down on (status, priority), …) and the rule picks the best
  // match per query — the Calcite materialized-view-navigation shape.
  // The list is keyed by normalized fact path; entry identity within it
  // is the (dims, measures) SHAPE: re-registering a shape replaces only
  // that shape's entry.
  private val entries = scala.collection.mutable.Map.empty[String, List[Entry]]

  private def sameShape(a: Entry, dims: Seq[String],
      measures: Seq[String]): Boolean =
    a.dims == dims && a.measures == measures

  // last successful signature re-check per entry (epoch ms) — the TTL
  // cache behind lookupFresh; guarded by entries' monitor
  private val verifiedAt = scala.collection.mutable.Map.empty[String, Long]

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** The rollup dir key for (normalized fact path, dims, measures, fact
    * signature). The trailing token is the cell-schema VERSION (r16 "v3"
    * added per-cell _min_/_max_ and non-null _cntm_ columns; r17 "v4"
    * changed _cntm_ to count the measure's DECIMAL(18,3) cast — ADVICE
    * r16: Spark's `Average` counts non-null values of its CAST child, so
    * a NaN/Infinity/overflowing double that casts to null must be
    * excluded from the divisor exactly as the fact-scan average excludes
    * it): folding it in retires older-schema dirs instead of serving
    * them with drifted semantics — [[gc]] recomputes this from each
    * dir's record and reclaims name mismatches. */
  private val CellSchemaVersion = "v4"

  private def cacheKey(sourceKey: String, dims: Seq[String],
      measures: Seq[String], sig: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(((((sourceKey +: dims) ++ measures :+ sig) :+ CellSchemaVersion)
        mkString "|")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** The rollup job + registration: build (or reuse) the pre-aggregated
    * table for `sourcePath` over `dims`, with `_cnt` plus an exact
    * DECIMAL(28,3) `_sum_<m>` per measure, and register it so
    * [[RollupRewriteRule]] serves matching aggregations from it. */
  /** Source-data signature: folded into the cache key so a
    * changed/appended fact at the same path builds a FRESH rollup
    * instead of silently serving stale aggregates while the rule claims
    * exactness — and re-checked per TTL expiry by [[lookupFresh]].
    * Delegates to [[graft.ml.IndexCache.sourceSignature]] (r17), which
    * resolves LOCALITY through the path's Hadoop FileSystem — the way
    * the Spark read resolves it, so a scheme-less path on a remote
    * `fs.defaultFS` is guarded by the remote listing rather than by a
    * java.io walk over an empty local dir (ADVICE r16: that constant
    * hash left the guard permanently satisfied and [[gc]] treating the
    * live fact as missing). Local paths keep the ~30 µs/file
    * fingerprint walk (length + mtime + 64 KiB head-CRC, same format as
    * pre-r17 so persisted registrations stay valid — the pre-r16 Hadoop
    * `listFiles` pass cost ~5 ms/file, a 45 s optimizer wall at 10k
    * files, SCALE.md "Staleness-guard pricing"); remote schemes get ONE
    * bounded recursive listing (relpath + length + mtime per file, no
    * per-file reads over the network — object stores batch ~1000
    * entries/RPC), so at 100 TB the serve-time staleness story holds on
    * exactly the storage the fact lives on. "" (the unguarded-legacy
    * marker: register always rebuilds, serves session-local under the
    * documented MV-snapshot contract) only when the signature cannot be
    * computed at all or the source holds zero data files. */
  private def sourceSignature(spark: SparkSession, sourcePath: String): String =
    graft.ml.IndexCache.sourceSignature(
      spark.sparkContext.hadoopConfiguration, sourcePath)

  /** The default rollup cache root — one definition shared by
    * [[register]], [[rehydrate]]'s scan, and [[deregister]]'s durable
    * revocation (the same single-sourcing discipline as
    * [[graft.ml.IndexCache.DefaultIvfRoot]]). */
  val DefaultCacheRoot: String = sys.props("java.io.tmpdir") + "/graft-rollup"

  def register(spark: SparkSession, sourcePath: String, dims: Seq[String],
      measures: Seq[String],
      cacheRoot: String = DefaultCacheRoot): Entry = {
    val sig = sourceSignature(spark, sourcePath)
    // 256-bit digest, not a 32-bit hash: this key gates an EXACTNESS
    // claim — a collision would serve another registration's (or a stale
    // state's) cells as exact answers, and at 32 bits that is a
    // birthday-plausible event across long-lived cache roots.
    val key = cacheKey(normalize(sourcePath), dims, measures, sig)
    val dest = s"$cacheRoot/rollup_$key"
    val done = new org.apache.hadoop.fs.Path(s"$dest/_SUCCESS")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an UNGUARDED source (sig "" — non-local path the local walk cannot
    // fingerprint) contributes no staleness state to the key, so a
    // cached dir under that key could be arbitrarily stale: an explicit
    // register always rebuilds it (register IS the refresh job there)
    val entry = Entry(dest, dims, measures, sig)
    if (sig.isEmpty || !fs.exists(done)) {
      // the build aggregation is EXACTLY the shape the rule matches — if
      // an older rollup of this same path is still registered, the build
      // would be rewritten to re-aggregate the stale rollup instead of
      // scanning the fact. Drop the IN-MEMORY entry first so the build
      // scans the source; the fresh entry is installed below. Persisted
      // records of superseded dirs stay in place deliberately (r16):
      // they are what [[gc]] reads to decide reclaimability, and a
      // record can only rehydrate mid-build if its fact signature still
      // matches the live dir — in which case its cells re-aggregate
      // EXACTLY (that is the rewrite's own soundness argument), so the
      // build being served from a current same-source rollup is a
      // speedup, never a staleness hazard. `deregister` remains the
      // user-facing durable revocation. Shape-scoped (r17 multi-rollup):
      // OTHER shapes registered over this fact stay serving — the build
      // aggregation itself can never be served from them, because its
      // `_cntm_` term (count over a cast) is not a rewritable aggregate.
      unregisterShapeInMemory(sourcePath, dims, measures)
      buildCells(spark, sourcePath, dims, measures, cacheRoot, dest, entry)
    } else lastBuildKindVar = "cached"
    entries.synchronized {
      val k = normalize(sourcePath)
      val rest = entries.getOrElse(k, Nil)
        .filterNot(e => sameShape(e, dims, measures))
      // sibling shapes recorded at an OLDER fact state are stale the
      // moment this registration observes the new state: keep them in
      // the list and the per-path verifiedAt stamp below would serve
      // them as "fresh" for a TTL — revoke them instead (their own
      // re-register is the refresh job)
      val (current, staleSibs) = rest.partition(e =>
        e.sourceSig == sig || e.sourceSig.isEmpty)
      staleSibs.foreach(revokeRecord)
      entries.put(k, entry :: current)
      verifiedAt(k) = System.currentTimeMillis()
      // a fresh registration invalidates a cached rehydration MISS for
      // the path (the register call's own build aggregation runs through
      // the rule and primes the miss cache before any record exists)
      rehydrateMissAt.remove(k)
    }
    // normally redundant (the staging publish carries the record inside
    // the dir) but self-healing for pre-r17 dirs or a record deleted by
    // hand — idempotent REPLACE_EXISTING write. The record stores the
    // ORIGINAL (scheme-qualified) source path: [[gc]]'s liveness check
    // and a later register's delta probe must resolve the same
    // FileSystem the registration did, not the default FS under the
    // stripped path (scheme-less local spellings are unchanged —
    // normalize is identity there)
    if (sig.nonEmpty) persistRegistration(spark, sourcePath, entry)
    RollupRewriteRule.install(spark)
    entry
  }

  /** How the LAST [[register]] call produced its cells — "full" (fact
    * rescan), "incremental" (delta-files-only aggregate merged into an
    * existing rollup's cells), or "cached" (current dir reused, no
    * build). Observability for specs, the oracle query, and the
    * `rollup_stats` procedure; not part of the serve path. */
  @volatile private var lastBuildKindVar: String = "full"
  def lastBuildKind: String = lastBuildKindVar

  // manifest of the exact fact files a rollup's cells ingested (the
  // fingerprint's own per-file entry lines) — what a later register
  // reads to classify the fact's change as insert-only vs update/delete.
  // Underscore-prefixed: lives inside the cells' parquet dir.
  private val ManifestRel = "_rollup_manifest.txt"

  private def readManifest(dir: java.io.File): Option[Set[String]] =
    scala.util.Try {
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, ManifestRel).toPath), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSet
    }.toOption

  /** The one aggregation that defines the cell schema (CellSchemaVersion
    * "v4"): `_cnt` group size, per measure the exact DECIMAL(28,3)
    * `_sum_`, the `_cntm_` divisor for avg — counting the measure's
    * DECIMAL(18,3) CAST, matching Spark's `Average` null semantics
    * exactly (a NaN/Infinity/overflowing double casts to null and is
    * excluded from the fact-scan average, so it must be excluded from
    * the divisor too; ADVICE r16) — and the `_min_`/`_max_`
    * semilattice pair over the raw measure. */
  private def aggregateCells(fact: org.apache.spark.sql.DataFrame,
      dims: Seq[String], measures: Seq[String]): org.apache.spark.sql.DataFrame =
    fact.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("_cnt"),
        measures.flatMap(m => Seq(
          sum(col(m).cast(DecimalType(18, 3))).as(s"_sum_$m"),
          count(col(m).cast(DecimalType(18, 3))).as(s"_cntm_$m"),
          min(col(m)).as(s"_min_$m"),
          max(col(m)).as(s"_max_$m"))): _*)

  /**
   * Produce and PUBLISH the cells for a registration — the r17 build
   * path closing two VERDICT asks at once:
   *
   *  - **O(delta) refresh** (ask #1): when a complete current-schema
   *    rollup for the same (fact, dims, measures) exists whose recorded
   *    file manifest is a strict subset of the live fact's files (the
   *    insert-only mutation wave — exactly [[graft.ml.IndexCache]]'s
   *    `growFrom` probe), the delta files ALONE are aggregated and
   *    merged into the existing cells: `_cnt`/`_sum_`/`_cntm_` add,
   *    `_min_`/`_max_` semilattice-merge — the `store_mv_incremental`
   *    fold, value-equal to a from-scratch build because every cell
   *    column is an order-free commutative monoid (pinned by
   *    RollupRewriteSpec + the `store_rollup_refresh_incremental`
   *    oracle hash). A delete/update wave (some ingested entry changed
   *    or gone) keeps the full rebuild: min/max cannot retract. At a
   *    daily-appending 100 TB fact this turns the per-mutation refresh
   *    bill from a full rescan into |delta files| + |cells|.
   *  - **staging publish** (ask #5): cells, manifest, and the
   *    registration record are written to a process-unique
   *    `.build-<pid>-…` staging dir and atomically renamed into place
   *    ([[graft.ml.IndexCache.publish]], with its lost-race
   *    discipline), so a published dir ALWAYS carries its record —
   *    no crash window between cell write and registration — and [[gc]]
   *    can reap crashed builders' staging dirs by dead-pid without ever
   *    judging recordless published dirs (those stay foreign, kept).
   */
  private def buildCells(spark: SparkSession, sourcePath: String,
      dims: Seq[String], measures: Seq[String], cacheRoot: String,
      dest: String, entry: Entry): Unit = {
    val staging = new java.io.File(
      s"$dest.build-${java.lang.ProcessHandle.current().pid()}-${System.nanoTime()}")
    try {
      val src = normalize(sourcePath)
      // delta classification is locality-resolved (r17): local facts
      // compare the fingerprint walk's entries, remote facts the bounded
      // listing's — so an insert-only wave on object storage takes the
      // O(delta) merge too (the manifest records whichever format its
      // source resolves to; formats never cross-match)
      val curEntries: Seq[(String, String)] =
        if (entry.sourceSig.isEmpty) Seq.empty
        else scala.util.Try(
          graft.ml.IndexCache.sourceEntriesResolved(sourcePath))
          .getOrElse(Seq.empty)
      val curSet = curEntries.map(_._1).toSet
      val base = Option(new java.io.File(cacheRoot).listFiles()).toSeq.flatten
        .filter(d => d.isDirectory && d.getName.startsWith("rollup_") &&
          !d.getName.contains(".build-"))
        .flatMap { d =>
          for {
            // REVOKED records qualify as a delta base too: revocation
            // (serve-time staleness, explicit deregister) only bars
            // SERVING — the refresh flow is exactly stale → revoked →
            // next register delta-merges from those cells, and the
            // manifest-subset proof below is value-based, independent
            // of serve eligibility
            r <- readRegistration(d).orElse(readRevokedRegistration(d))
            if normalize(r.source) == src && r.dims == dims &&
              r.measures == measures
            // same cell-schema version only: the dir publishes under the
            // key its own record derives with TODAY's version constant
            if d.getName == s"rollup_${cacheKey(normalize(r.source),
              r.dims, r.measures, r.sourceSig)}"
            if new java.io.File(d, "_SUCCESS").isFile
            ingested <- readManifest(d)
            if ingested.nonEmpty && ingested.subsetOf(curSet) &&
              ingested.size < curSet.size
          } yield (d, ingested)
        }.sortBy(-_._2.size).headOption
      val cells = base match {
        case Some((old, ingested)) =>
          lastBuildKindVar = "incremental"
          val deltaPaths = curEntries.filterNot(e => ingested(e._1)).map(_._2)
          // basePath keeps hive-partition dim columns in the delta read
          val delta = aggregateCells(
            spark.read.option("basePath", sourcePath).parquet(deltaPaths: _*),
            dims, measures)
          // the partial-merge fold: every cell column re-aggregates from
          // partials exactly (counts/sums add — `_sum_` back-cast to its
          // DECIMAL(28,3) cell type, overflow behaving as the fact
          // scan's own Sum would — min/max idempotent-merge; nulls skip
          // on both sides exactly as the fact scan skips null rows)
          spark.read.parquet(old.getPath).unionByName(delta)
            .groupBy(dims.map(col): _*)
            .agg(sum(col("_cnt")).as("_cnt"),
              measures.flatMap(m => Seq(
                sum(col(s"_sum_$m")).cast(DecimalType(28, 3)).as(s"_sum_$m"),
                sum(col(s"_cntm_$m")).as(s"_cntm_$m"),
                min(col(s"_min_$m")).as(s"_min_$m"),
                max(col(s"_max_$m")).as(s"_max_$m"))): _*)
        case None =>
          lastBuildKindVar = "full"
          aggregateCells(spark.read.parquet(sourcePath), dims, measures)
      }
      cells.write.mode("overwrite").parquet(staging.getPath)
      if (curSet.nonEmpty)
        java.nio.file.Files.write(
          new java.io.File(staging, ManifestRel).toPath,
          curEntries.map(_._1).mkString("\n").getBytes("UTF-8"))
      if (entry.sourceSig.nonEmpty) {
        // record INSIDE the staging dir, published atomically with the
        // cells — rollupPath in the record is implicit (the dir itself)
        writeRegistrationInto(staging, src, entry)
      }
    } catch {
      case t: Throwable =>
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del)); f.delete()
        }
        del(staging)
        throw t
    }
    // buildCells only runs when dest is absent, incomplete, or an
    // UNGUARDED (sig "") dir whose register-time contract is "always
    // rebuild" — in every case the fresh build supersedes whatever sits
    // at dest, so clear it before the atomic rename (publish's
    // lost-race path would otherwise serve the stale complete dir and
    // discard the rebuild)
    val target = new java.io.File(dest)
    if (target.exists()) {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete()
      }
      del(target)
    }
    graft.ml.IndexCache.publish(staging, target, "_SUCCESS")
  }

  // ---- persisted registrations (the ANN registry's r15 durability,
  // applied to the rollup registry): a fresh session's dashboard
  // GROUP BY rides a previously-built rollup without a re-register.
  // The record lives INSIDE the rollup dir; rehydrate validates it
  // against the LIVE fact signature, so a stale record can never serve
  // (the same structural guarantee lookupFresh gives in-session).

  // underscore-prefixed: the record lives INSIDE the rollup parquet dir,
  // and anything unprefixed there would be read as a parquet data file
  private val RegistrationRel = "_rollup_registration.txt"

  // a durably-revoked registration's record, renamed aside by
  // [[deregister]]: invisible to [[rehydrate]]/[[statsRows]] (revocation
  // holds across sessions) but proof to [[gc]] that the dir is OURS and
  // reclaimable at the age bar — without it every deregister leaked one
  // foreign-looking dir into the shared root
  private val RevokedRel = "_rollup_registration.revoked"

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  private def persistRegistration(spark: SparkSession, sourceKey: String,
      entry: Entry): Unit = scala.util.Try {
    writeRegistrationInto(new java.io.File(entry.rollupPath), sourceKey, entry)
  }

  private def writeRegistrationInto(dir: java.io.File, sourceKey: String,
      entry: Entry): Unit = {
    val lines = Seq(
      "v=1",
      s"source=${enc(sourceKey)}",
      s"dims=${entry.dims.map(enc).mkString(",")}",
      s"measures=${entry.measures.map(enc).mkString(",")}",
      s"sourceSig=${enc(entry.sourceSig)}")
    // tmp-file + ATOMIC_MOVE, matching AnnIndexRegistry's sidecar
    // discipline (ADVICE r15): a concurrent session rehydrating mid-write
    // must never read a truncated record (a plain truncate-then-write
    // fails safe — a 30s cached miss — but breaks the atomic contract).
    // The tmp name MUST be underscore-prefixed: it lives inside the
    // rollup PARQUET dir, and an unprefixed leftover (crash between
    // create and move) would be read as a data file, failing every
    // later scan of the rollup (r16 review).
    val tmp = java.io.File.createTempFile("_registration", ".tmp", dir)
    java.nio.file.Files.write(tmp.toPath,
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(dir, RegistrationRel).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // a re-registered dir is live again: a lingering revoked marker from
    // an earlier deregister would hand the dir to gc despite the fresh
    // record (the live record wins, but the marker is now stale noise)
    new java.io.File(dir, RevokedRel).delete()
  }

  private final case class Reg(source: String, dims: Seq[String],
      measures: Seq[String], sourceSig: String)

  private def readRegistration(dir: java.io.File): Option[Reg] =
    readRecordFile(new java.io.File(dir, RegistrationRel))

  /** A revoked dir's record ([[RevokedRel]]) — readable ONLY by the
    * delta-base probe; rehydration and serving read the live name. */
  private def readRevokedRegistration(dir: java.io.File): Option[Reg] =
    readRecordFile(new java.io.File(dir, RevokedRel))

  private def readRecordFile(f: java.io.File): Option[Reg] =
    scala.util.Try {
      val kv = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .split("\n").filter(_.contains("="))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
        .toMap
      require(kv.get("v").contains("1"))
      def list(k: String): Seq[String] =
        kv.get(k).filter(_.nonEmpty).toSeq.flatMap(_.split(",").toSeq.map(dec))
      Reg(dec(kv("source")), list("dims"), list("measures"),
        dec(kv("sourceSig")))
    }.toOption

  // negative-result TTL cache: tryRewrite fires for every Aggregate over
  // a single-root scan, and unregistered facts must not pay a cache-root
  // listing per optimizer invocation
  private val rehydrateMissAt = new java.util.LinkedHashMap[String, Long](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Long]): Boolean =
      this.size() > 256
  }
  private[plans] val RehydrateMissTtlMs = 30000L

  /** Rebuild registrations for `path` from persisted records in the
    * default cache root — served only when a record's fact signature
    * matches the LIVE directory. ALL matching shapes rehydrate (newest
    * record per (dims, measures)); empty (TTL-cached miss) otherwise —
    * the aggregation keeps its exact fact scan. */
  def rehydrateAll(path: String,
      roots: Seq[String] = Seq(DefaultCacheRoot)): Seq[Entry] = {
    val key = normalize(path)
    val now = System.currentTimeMillis()
    entries.synchronized {
      if (Option(rehydrateMissAt.get(key))
          .exists(t => now - t >= 0 && now - t < RehydrateMissTtlMs))
        return Nil
    }
    def miss: Seq[Entry] = {
      entries.synchronized { rehydrateMissAt.put(key, now) }
      Nil
    }
    // signature over the path AS PASSED (scheme-qualified for remote
    // facts — the same string register signed); records match on the
    // normalized form so pre-r17 stripped-path records stay valid
    val currentSig = scala.util.Try(
      sourceSignature(SparkSession.active, path)).getOrElse("")
    if (currentSig.isEmpty) return miss
    val candidates = roots.flatMap { root =>
      Option(new java.io.File(root).listFiles()).toSeq.flatten
        .filter(_.isDirectory)
        .flatMap { d =>
          val rec = new java.io.File(d, RegistrationRel)
          if (!rec.isFile) None
          else readRegistration(d)
            .filter(r => normalize(r.source) == key && r.sourceSig == currentSig)
            .map(r => (d, rec.lastModified(), r))
        }
    }
    // newest complete record per SHAPE — every registered dim set over
    // this fact comes back, not just one
    val rehydrated = candidates
      .groupBy { case (_, _, r) => (r.dims, r.measures) }
      .values.toSeq
      .flatMap(_.sortBy(-_._2).headOption)
      .filter { case (dir, _, _) => new java.io.File(dir, "_SUCCESS").isFile }
      .map { case (dir, _, r) =>
        Entry(dir.getPath, r.dims, r.measures, r.sourceSig)
      }
    if (rehydrated.isEmpty) miss
    else {
      entries.synchronized {
        entries.put(key, rehydrated.toList)
        verifiedAt(key) = now
      }
      rehydrated
    }
  }

  /** Single-entry [[rehydrateAll]] (compat): the newest shape. */
  def rehydrate(path: String,
      roots: Seq[String] = Seq(DefaultCacheRoot)): Option[Entry] =
    rehydrateAll(path, roots).headOption

  def lookupAll(path: String): Seq[Entry] =
    entries.synchronized { entries.getOrElse(normalize(path), Nil) }

  def lookup(path: String): Option[Entry] = lookupAll(path).headOption

  /** [[lookupAll]] plus the serve-time staleness guard (VERDICT r14 ask
    * #2, the [[AnnIndexRegistry.lookupFresh]] twin — MORE important here
    * because this rule claims EXACTNESS): before registrations serve,
    * their recorded fact signature is re-checked against the live
    * directory, TTL-cached per path (one fact, one signature — all
    * current shapes share it); a fact rewritten in place without
    * re-registration revokes the stale shapes and the aggregation keeps
    * its exact fact scan instead of silently re-aggregating stale
    * cells. Unguarded ("" sig) entries always serve, under the
    * documented MV-snapshot contract. */
  def lookupAllFresh(path: String, ttlMs: Long): Seq[Entry] = {
    val key = normalize(path)
    val all = lookupAll(path)
    if (all.isEmpty) return Nil
    val (guarded, unguarded) = all.partition(_.sourceSig.nonEmpty)
    if (guarded.isEmpty) return unguarded
    val now = System.currentTimeMillis()
    val fresh = entries.synchronized {
      verifiedAt.get(key).exists(t => now - t >= 0 && now - t < ttlMs)
    }
    if (fresh) return all
    // re-check over the path AS PASSED — the rule passes the scan's own
    // root string, so a remote fact re-signs through its own FileSystem
    scala.util.Try(sourceSignature(SparkSession.active, path)) match {
      case scala.util.Success(sig) =>
        val (current, stale) = guarded.partition(_.sourceSig == sig)
        if (stale.nonEmpty) entries.synchronized {
          stale.foreach(revokeRecord)
          val rest = entries.getOrElse(key, Nil).filterNot(e =>
            stale.exists(s => sameShape(e, s.dims, s.measures)))
          if (rest.isEmpty) { entries.remove(key); verifiedAt.remove(key) }
          else entries.put(key, rest)
        }
        if (current.nonEmpty) entries.synchronized { verifiedAt(key) = now }
        current ++ unguarded
      // cannot-compute (transient FS error) fails closed for this serve
      // only — never a revocation on a cannot-know result
      case scala.util.Failure(_) => unguarded
    }
  }

  /** Single-entry [[lookupAllFresh]] (compat). */
  def lookupFresh(path: String, ttlMs: Long): Option[Entry] =
    lookupAllFresh(path, ttlMs).headOption

  private def unregisterShapeInMemory(sourcePath: String, dims: Seq[String],
      measures: Seq[String]): Unit =
    entries.synchronized {
      val k = normalize(sourcePath)
      val rest = entries.getOrElse(k, Nil)
        .filterNot(e => sameShape(e, dims, measures))
      if (rest.isEmpty) { entries.remove(k); verifiedAt.remove(k) }
      else entries.put(k, rest)
    }

  private def unregisterInMemory(sourcePath: String): String =
    entries.synchronized {
      val k = normalize(sourcePath)
      entries.remove(k)
      verifiedAt.remove(k)
      k
    }

  /** Rename one entry's persisted record to the revoked marker (the
    * durable shape-scoped revocation [[lookupAllFresh]] and [[register]]
    * use for stale siblings); best-effort. */
  private def revokeRecord(e: Entry): Unit = scala.util.Try {
    val d = new java.io.File(e.rollupPath)
    val rec = new java.io.File(d, RegistrationRel)
    if (rec.isFile) {
      val revoked = new java.io.File(d, RevokedRel)
      revoked.delete()
      if (!rec.renameTo(revoked)) rec.delete()
    }
  }

  /** Remove a registration — DURABLY (persisted records for this source
    * in the default root go too, so [[rehydrate]] cannot resurrect an
    * explicit revocation); `clear()` stays session-local by design.
    * The record is RENAMED to [[RevokedRel]], not deleted (r17): a
    * deleted record turned the cells dir into a foreign recordless dir
    * [[gc]] keeps forever — every deregister leaked one dir into the
    * shared root (observed: 96 of 98 dirs in a three-round-old cache
    * root were exactly these orphans). The marker keeps revocation
    * durable (rehydrate reads only the live name) while telling gc the
    * dir is OURS and reclaimable at the age bar. */
  def deregister(sourcePath: String): Unit = {
    val key = unregisterInMemory(sourcePath)
    scala.util.Try {
      Option(new java.io.File(DefaultCacheRoot).listFiles())
        .toSeq.flatten.filter(_.isDirectory)
        .foreach { d =>
          if (readRegistration(d).exists(r => normalize(r.source) == key)) {
            val rec = new java.io.File(d, RegistrationRel)
            val revoked = new java.io.File(d, RevokedRel)
            revoked.delete()
            if (!rec.renameTo(revoked)) rec.delete()
          }
        }
    }
  }

  def clear(): Unit = entries.synchronized {
    entries.clear()
    verifiedAt.clear()
    rehydrateMissAt.clear()
  }

  /** The `rollup_stats` procedure's row source (the
    * [[AnnIndexRegistry.statsRows]] twin): for a registered fact path —
    * rehydrating a persisted registration first, so a fresh SQL session
    * can inspect without a re-CALL — one row of (rollup dir, dims,
    * measures, cell count, cell bytes, guarded, last build kind). Cell
    * count/bytes come from the dir's parquet footers + file lengths
    * (driver-side metadata, no job); `guarded` = the registration
    * carries a fact signature the serve-time staleness check re-verifies
    * (an unguarded "" entry serves under the MV-snapshot contract). */
  def statsRows(spark: SparkSession, sourcePath: String)
      : Seq[(String, String, String, Long, Long, Boolean)] = {
    val all = {
      val live = lookupAll(sourcePath)
      if (live.nonEmpty) live
      else rehydrateAll(sourcePath, Seq(DefaultCacheRoot))
    }
    all.sortBy(e => (e.dims.size, e.dims.mkString(","))).map { e =>
      val dir = new java.io.File(e.rollupPath)
      val files = Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      val bytes = files.map(_.length()).sum
      val cells = scala.util.Try(
        spark.read.parquet(e.rollupPath).count()).getOrElse(-1L)
      (e.rollupPath, e.dims.mkString(","), e.measures.mkString(","),
        cells, bytes, e.sourceSig.nonEmpty)
    }
  }

  /** Every rollup dir a live registration still references — the set
    * [[gc]] callers pass as `keep` so a sweep can never reclaim a dir
    * the next rewritten aggregation in this session would read (the
    * [[AnnIndexRegistry.livePaths]] twin). */
  def livePaths: Set[String] = entries.synchronized {
    entries.values.flatten.map(_.rollupPath).toSet
  }

  /**
   * Reclaim superseded rollup dirs from a cache root — the lifecycle
   * that bounds the root under fact-mutation cadence (VERDICT r15 ask
   * #4, [[graft.ml.IndexCache.gc]]'s discipline applied here): every
   * re-register after a fact change creates a NEW `rollup_<key>` dir
   * and nothing else ever reclaimed the old ones, so the root grew by
   * one dir per mutation cycle — and [[rehydrate]] lists the whole root
   * per TTL-expired miss, making unbounded growth an optimizer-time
   * cost. A dir is removed when its persisted registration can never
   * serve again:
   *
   *  - its fact dir no longer exists, or the fact's live signature no
   *    longer matches the record's (rehydrate would skip it; register
   *    would build a fresh dir);
   *  - its dir name no longer matches the key its own record derives
   *    (a pre-r16 schema-version dir — same fact, same params, but a
   *    cell schema [[register]] will never publish under this name
   *    again);
   *  - recordless dirs are conservatively KEPT (not ours to judge —
   *    the same foreign-dir discipline as the index-cache GC).
   *
   * `olderThanMs` is the shared-root race guard (only dirs untouched
   * that long are swept; another session may still hold a
   * just-superseded path — maintenance-window discipline, as on the ANN
   * side); `keep` pins paths live registrations in THIS session
   * reference ([[livePaths]]). Returns the removed paths.
   */
  def gc(cacheRoot: String = DefaultCacheRoot, olderThanMs: Long = 3600000L,
      keep: Set[String] = Set.empty): Seq[String] = {
    val now = System.currentTimeMillis()
    val keepAbs = keep.map(p => new java.io.File(p).getAbsolutePath)
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    // live signature per fact dir, computed once per sweep; None = could
    // not compute (transient FS error) — never grounds for reclamation.
    // The resolver (r17) returns Some("") for a MISSING or emptied fact
    // dir — local or remote, resolved through the path's Hadoop FS —
    // which mismatches every persisted record (records only exist under
    // non-empty signatures), so a vanished fact reclaims without a
    // locality-blind java.io exists() probe (ADVICE r16: that probe
    // read a live REMOTE fact as missing and reclaimed its dirs).
    val sigCache = scala.collection.mutable.Map.empty[String, Option[String]]
    def liveSig(source: String): Option[String] =
      sigCache.getOrElseUpdate(source,
        scala.util.Try(sourceSignature(SparkSession.active, source)).toOption
          .filter(_.nonEmpty)
          .orElse(
            // "" is ambiguous between "gone" and "cannot compute": only
            // a positive Hadoop-FS absence check turns it into the
            // reclaim-grounds sentinel; otherwise keep (fail-safe)
            scala.util.Try {
              val p = new org.apache.hadoop.fs.Path(source)
              val fs = p.getFileSystem(SparkSession.active
                .sparkContext.hadoopConfiguration)
              if (!fs.exists(fs.makeQualified(p))) Some("") else None
            }.toOption.flatten))
    val (staging, published) =
      Option(new java.io.File(cacheRoot).listFiles()).toSeq.flatten
        .filter(d => d.isDirectory && d.getName.startsWith("rollup_"))
        .partition(_.getName.contains(".build-"))
    // a crashed builder's staging leftover (r17: cells+record publish by
    // atomic rename, so an unpublished `.build-` dir can never serve) —
    // reaped when its builder process is dead, exactly the
    // [[graft.ml.IndexCache.gc]] discipline; a LIVE builder's staging
    // dir is never touched regardless of age
    staging.foreach { d =>
      val pid = d.getName.split("\\.build-").lift(1)
        .flatMap(_.split("-").headOption)
        .flatMap(s => scala.util.Try(s.toLong).toOption)
      if (!pid.exists(p => java.lang.ProcessHandle.of(p).isPresent())) {
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del)); f.delete()
        }
        del(d)
        if (!d.exists()) removed += d.getPath
      }
    }
    published.foreach { d =>
        def reap(): Unit = {
          def del(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(del))
            f.delete()
          }
          del(d)
          // report reclaimed only when the dir is actually gone — a
          // partially-failed delete (open handle, permission) must
          // not read as reclaimed in the procedure output (r16 review)
          if (!d.exists()) removed += d.getPath
        }
        val ageOk = now - d.lastModified() >= olderThanMs &&
          !keepAbs.contains(d.getAbsolutePath)
        readRegistration(d) match {
          case Some(r) =>
            val expectedKey =
              cacheKey(normalize(r.source), r.dims, r.measures, r.sourceSig)
            val stale =
              liveSig(r.source).exists(_ != r.sourceSig) ||
              d.getName != s"rollup_$expectedKey"
            if (stale && ageOk) reap()
          case None =>
            // no live record but a revoked marker: a deregistered dir —
            // ours by construction, never serveable again (rehydrate
            // reads only the live name) — reclaimable at the age bar.
            // Truly recordless dirs stay foreign, kept.
            if (new java.io.File(d, RevokedRel).isFile && ageOk) reap()
        }
      }
    removed.toSeq
  }
}

object RollupRewriteRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rollup.rewrite.enabled"

  /** TTL for the serve-time fact-signature re-check
    * ([[RollupRegistry.lookupFresh]]); 0 = re-verify every serve.
    * Lenient parse — a malformed value must never fail optimization. */
  val StaleCheckMsKey = "spark.graft.rollup.staleCheckMs"
  val DefaultStaleCheckMs = 10000L

  private def staleCheckMs: Long =
    scala.util.Try(
      conf.getConfString(StaleCheckMsKey, DefaultStaleCheckMs.toString).toLong)
      .getOrElse(DefaultStaleCheckMs)

  /** Idempotent session install (the runtime path; GraftExtensions is
    * the static-conf path). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RollupRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewriteRule

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else plan.transformDown {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteGroupingSets(agg)).getOrElse(agg)
    }

  /** Walk a pruning-Project / Filter chain to a single registered fact
    * relation; returns (filter conjuncts, fact relation, registrations).
    * ALL current registrations for the fact come back (r17 multi-rollup),
    * ordered fewest-dims-first — the most aggregated rollup that can
    * serve a query has the fewest cells, so the first candidate that
    * matches is the cheapest (the Calcite MV-navigation pick). */
  private def walkToFact(start: LogicalPlan)
      : Option[(Seq[Expression], LogicalRelation, Seq[RollupRegistry.Entry])] = {
    var conds = Seq.empty[Expression]
    var cur = start
    var rel: LogicalRelation = null
    while (rel == null) cur match {
      case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        cur = c
      case Filter(cond, c) =>
        conds ++= splitConjuncts(cond); cur = c
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        rel = lr
      case _ => return None
    }
    val roots = rel.relation.asInstanceOf[HadoopFsRelation].location.rootPaths
    if (roots.size != 1) return None
    val found = {
      val fresh = RollupRegistry.lookupAllFresh(roots.head.toString, staleCheckMs)
      if (fresh.nonEmpty) fresh
      else RollupRegistry.rehydrateAll(roots.head.toString)
    }
    if (found.isEmpty) None
    else Some((conds, rel,
      found.sortBy(e => (e.dims.size, e.dims.mkString(",")))))
  }

  /** Filters must be deterministic AND touch dims only (then they remap
    * onto the rollup). The determinism gate matters: a reference-free
    * nondeterministic conjunct (rand() < 0.5 sampling) vacuously passes
    * the dims-only forall but would evaluate per rollup CELL instead of
    * per fact row — silently different results. */
  private def condsRemappable(conds: Seq[Expression], dimSet: Set[String]): Boolean =
    conds.forall(c => c.deterministic &&
      c.references.forall(a => dimSet.contains(a.name)))

  /** Each aggregate: exactly count(1) (non-distinct, non-null literal),
    * the house exact-decimal sum, min/max over a raw registered measure,
    * or the exact-decimal average — rewritten to re-aggregate the
    * rollup's `_cnt` / `_sum_<m>` / `_min_<m>` / `_max_<m>` columns.
    * Lookups are `.get`-guarded: a v1 rollup dir (rehydrated from a
    * pre-r16 record, no min/max columns) simply declines the new shapes
    * and keeps the exact fact scan instead of failing optimization. */
  private def rewriteAggFn(ae: AggregateExpression, byName: Map[String, Attribute],
      measureSet: Set[String]): Option[Expression] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case c: Count if c.children.forall {
        // non-null literals only: count(NULL) counts ZERO rows, so
        // rewriting it to the group size would be wrong
        case Literal(v, _) => v != null; case _ => false
      } && c.children.nonEmpty =>
        // coalesce to 0 so the UNGROUPED shape stays exact: an empty
        // selection makes count(1) return 0 on the fact but
        // sum(_cnt) return NULL on the rollup
        Some(Coalesce(Seq(
          Sum(byName("_cnt")).toAggregateExpression(), Literal(0L))))
      case s: Sum => s.child match {
        case cst: Cast if cst.dataType == DecimalType(18, 3) =>
          cst.child match {
            case m: AttributeReference if measureSet.contains(m.name) =>
              Some(Cast(Sum(byName(s"_sum_${m.name}")).toAggregateExpression(),
                ae.dataType))
            case _ => None
          }
        case _ => None
      }
      // min/max over the RAW measure column: exactly re-aggregable from
      // per-cell min/max for any orderable type (idempotent order-free
      // semilattice — duplicates and grouping don't matter), so unlike
      // sum these need no decimal spelling. NULL semantics carry over:
      // an all-null cell stores a null _min/_max, which re-aggregation
      // ignores exactly like the fact scan ignores the null rows.
      case mn: Min => mn.child match {
        case m: AttributeReference if measureSet.contains(m.name) =>
          byName.get(s"_min_${m.name}")
            .map(c => Min(c).toAggregateExpression())
        case _ => None
      }
      case mx: Max => mx.child match {
        case m: AttributeReference if measureSet.contains(m.name) =>
          byName.get(s"_max_${m.name}")
            .map(c => Max(c).toAggregateExpression())
        case _ => None
      }
      // avg(CAST(m AS DECIMAL(18,3))) = sum(_sum_m) / sum(_cntm_m) —
      // the divisor is the measure's NON-NULL count (Spark's Average
      // ignores nulls; dividing by the group size would silently shrink
      // the average of a nullable measure) — spelled at EXACTLY the
      // types Spark's own Average uses internally (sum at
      // DECIMAL(28,3) = input precision + 10, count at DECIMAL(20,0),
      // divide, cast to the avg result type DECIMAL(22,7)) so the
      // half-up rounding at scale 7 is bit-identical to the fact-scan
      // plan — pinned value-equal by RollupRewriteSpec (incl. a
      // null-bearing measure) and the oracle hash. A raw double avg
      // never matches, same as raw double sum.
      case av: Average => av.child match {
        case cst: Cast if cst.dataType == DecimalType(18, 3) =>
          cst.child match {
            case m: AttributeReference if measureSet.contains(m.name) =>
              for {
                sumCol <- byName.get(s"_sum_${m.name}")
                cntCol <- byName.get(s"_cntm_${m.name}")
              } yield Cast(Divide(
                Cast(Sum(sumCol).toAggregateExpression(),
                  DecimalType(28, 3)),
                Cast(Sum(cntCol).toAggregateExpression(),
                  DecimalType(20, 0))),
                ae.dataType)
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }

  /** Rewrite a whole OUTPUT expression tree (r16): any DETERMINISTIC
    * scalar computation over rewritable aggregates and mapped
    * attributes — `sum(dec)/count(1)`, `count(1) * 100`,
    * `max(m) - min(m)`, the house outer `.cast("double")` — rewrites by
    * replacing each embedded [[AggregateExpression]] via
    * [[rewriteAggFn]] and each attribute via `attr` (grouping-dim remap
    * in the flat shape; Expand-attr passthrough in grouping sets),
    * leaving the scalar structure verbatim. Sound because the embedded
    * aggregates re-aggregate to VALUE-identical results and a
    * deterministic scalar of identical inputs is identical; a
    * nondeterministic wrapper (rand() jitter) evaluates per output row
    * on both plans but must not ride an "exact" rewrite — declined.
    * Any unmapped attribute or non-rewritable aggregate declines the
    * whole plan (None). */
  private def rewriteOutputExpr(e: Expression, byName: Map[String, Attribute],
      measureSet: Set[String],
      attr: AttributeReference => Option[Expression]): Option[Expression] =
    e match {
      case ae: AggregateExpression => rewriteAggFn(ae, byName, measureSet)
      case a: AttributeReference => attr(a)
      case _ if e.children.isEmpty => if (e.deterministic) Some(e) else None
      case _ =>
        if (!e.deterministic) return None
        val kids = e.children.map(rewriteOutputExpr(_, byName, measureSet, attr))
        if (kids.exists(_.isEmpty)) None
        else Some(e.withNewChildren(kids.map(_.get)))
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (conds, rel, candidates) = walkToFact(agg.child).getOrElse(return None)
    // fewest-dims-first: the first registered shape that can serve this
    // aggregation is the most aggregated (smallest cells) one
    candidates.view.flatMap(tryRewriteWith(agg, conds, rel, _)).headOption
  }

  private def tryRewriteWith(agg: Aggregate, conds: Seq[Expression],
      rel: LogicalRelation, entry: RollupRegistry.Entry): Option[LogicalPlan] = {
    val dimSet = entry.dims.toSet

    // grouping keys: plain dim attributes of the fact relation
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if dimSet.contains(a.name) &&
        rel.outputSet.contains(a) => a
      case _ => return None
    }
    if (!condsRemappable(conds, dimSet)) return None

    val spark = SparkSession.active
    val rollup = spark.read.parquet(entry.rollupPath).queryExecution.analyzed
    val byName = rollup.output.map(o => o.name -> o).toMap
    val measureSet = entry.measures.toSet

    // each output: a grouping dim, or any deterministic scalar
    // expression over rewritable aggregates and grouping dims
    // ([[rewriteOutputExpr]] — covers the bare-agg and outer-Cast house
    // spellings plus dashboard arithmetic like sum/count, max - min)
    val dimRemap: AttributeReference => Option[Expression] = a =>
      if (groupAttrs.exists(_.exprId == a.exprId)) byName.get(a.name) else None
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(byName(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(expr, name) =>
        Alias(rewriteOutputExpr(expr, byName, measureSet, dimRemap)
          .getOrElse(return None), name)(exprId = al.exprId)
      case _ => return None
    }
    val filtered = conds
      .map(_.transform {
        case a: AttributeReference => byName(a.name)
      })
      .reduceOption(And)
      .fold(rollup)(c => Filter(c, rollup))
    Some(Aggregate(groupAttrs.map(g => byName(g.name)), newAggs, filtered))
  }

  /** ROLLUP/CUBE/GROUPING SETS navigation (VERDICT r10 ask #7): the
    * analyzer lowers grouping sets to Aggregate-over-Expand — one Expand
    * projection per grouping set, emitting each dim either as itself or
    * NULL plus the spark_grouping_id literal. COUNT and DECIMAL SUM
    * re-aggregate exactly per grouping set, so the SAME registered
    * rollup serves every set: rebuild the Expand over the rollup's cells
    * (the `_cnt`/`_sum_*` columns pass through every projection, kept
    * dims remap onto the rollup's columns, the NULL/grouping-id literals
    * stay verbatim) and re-aggregate. The Expand-created dim copies and
    * the grouping-id attribute are REUSED in the new plan, so the
    * Aggregate's grouping expressions and any grouping()/grouping_id()
    * output expressions stay valid untouched. Fences: same fact-walk,
    * dim-only-filter, and count(1)/exact-decimal-sum gates as the flat
    * rewrite; non-rewritable aggregates (even ones that only touch kept
    * attrs) keep the exact plan — a duplicate-sensitive aggregate over
    * cells would differ from one over rows. */
  private def tryRewriteGroupingSets(agg: Aggregate): Option[LogicalPlan] = {
    // locate the Expand, tolerating pruning Projects the optimizer adds
    var cur = agg.child
    var done = false
    while (!done) cur match {
      case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        cur = p.child
      case _ => done = true
    }
    val expand = cur match {
      case e: Expand => e
      case _ => return None
    }
    val (conds, _, candidates) = walkToFact(expand.child).getOrElse(return None)
    candidates.view
      .flatMap(tryRewriteGroupingSetsWith(agg, expand, conds, _)).headOption
  }

  private def tryRewriteGroupingSetsWith(agg: Aggregate, expand: Expand,
      conds: Seq[Expression], entry: RollupRegistry.Entry)
      : Option[LogicalPlan] = {
    val dimSet = entry.dims.toSet
    if (!condsRemappable(conds, dimSet)) return None

    // grouping keys must be attributes the Expand produced (the dim
    // copies + spark_grouping_id)
    val groupAttrs = agg.groupingExpressions.map {
      case a: Attribute if expand.outputSet.contains(a) => a
      case _ => return None
    }
    val keepSet = AttributeSet(groupAttrs)
    val keptIdx = expand.output.zipWithIndex.filter { case (a, _) => keepSet.contains(a) }
    if (keptIdx.isEmpty) return None

    val spark = SparkSession.active
    val rollup = spark.read.parquet(entry.rollupPath).queryExecution.analyzed
    val byName = rollup.output.map(o => o.name -> o).toMap
    val measureSet = entry.measures.toSet
    val passthrough: Seq[Attribute] =
      rollup.output.filter(a => a.name == "_cnt" ||
        a.name.startsWith("_sum_") || a.name.startsWith("_cntm_") ||
        a.name.startsWith("_min_") || a.name.startsWith("_max_"))

    // per grouping set: kept slots remap (fact dim -> rollup column;
    // NULL / grouping-id literals verbatim); anything computed bails
    val newProjections = expand.projections.map { proj =>
      passthrough ++ keptIdx.map { case (_, i) =>
        proj(i) match {
          case a: AttributeReference if dimSet.contains(a.name) =>
            byName(a.name): Expression
          case l: Literal => l: Expression
          case _ => return None
        }
      }
    }
    val newOutput: Seq[Attribute] = passthrough ++ keptIdx.map(_._1)

    // outputs rewrite like the flat shape ([[rewriteOutputExpr]]), with
    // the Expand-created attrs (kept dim copies + spark_grouping_id)
    // passing through VERBATIM — they are reused in the new Expand.
    // Never an un-rewritten aggregate: its value over cells could
    // differ from its value over fact rows.
    val keepRemap: AttributeReference => Option[Expression] = a =>
      if (keepSet.contains(a)) Some(a) else None
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al @ Alias(expr, name) =>
        Alias(rewriteOutputExpr(expr, byName, measureSet, keepRemap)
          .getOrElse(return None), name)(exprId = al.exprId)
      case ne if ne.references.subsetOf(keepSet) &&
          !ne.exists(_.isInstanceOf[AggregateExpression]) => ne
      case _ => return None
    }
    val filtered = conds
      .map(_.transform { case a: AttributeReference => byName(a.name) })
      .reduceOption(And)
      .fold(rollup)(c => Filter(c, rollup))
    Some(Aggregate(groupAttrs, newAggs,
      Expand(newProjections, newOutput, filtered)))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
