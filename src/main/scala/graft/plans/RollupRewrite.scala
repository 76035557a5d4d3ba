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

  private val entries = scala.collection.mutable.Map.empty[String, Entry]

  // last successful signature re-check per entry (epoch ms) — the TTL
  // cache behind lookupFresh; guarded by entries' monitor
  private val verifiedAt = scala.collection.mutable.Map.empty[String, Long]

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** The rollup dir key for (normalized fact path, dims, measures, fact
    * signature). "v3" is the cell-schema version (r16 added per-cell
    * _min_/_max_ and non-null _cntm_ columns): folding it in retires
    * older-schema dirs instead of serving them with the wider measure
    * surface — [[gc]] recomputes this from each dir's record and
    * reclaims name mismatches. */
  private def cacheKey(sourceKey: String, dims: Seq[String],
      measures: Seq[String], sig: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(((((sourceKey +: dims) ++ measures :+ sig) :+ "v3")
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
    * Delegates to [[graft.ml.IndexCache.sourceFingerprint]] (the ANN
    * guard's recursive java.io walk + 64 KiB head-CRCs), replacing the
    * pre-r16 Hadoop `listFiles(recursive)` pass: measured on this box,
    * the Hadoop lister costs ~5 ms/file through RawLocalFileSystem's
    * per-file stat (45 s at a 10k-file fact dir, 133 s at 20k — an
    * optimizer-time wall per TTL expiry at exactly the file counts a
    * partitioned fact reaches), while the fingerprint walk is
    * ~30 µs/file (0.32 s at 10k, 0.52 s at 20k) AND catches same-size
    * in-place rewrites the mtime-only signature missed. Numbers in
    * SCALE.md ("Staleness-guard pricing"). NON-LOCAL paths (hdfs://,
    * s3a://, …) return "" — the unguarded-legacy marker: the java.io
    * walk cannot see them, and hashing its empty listing would make the
    * guard permanently satisfied (stale cells serving as "exact") and
    * [[gc]] treat a live remote fact as nonexistent (r16 review). Such
    * registrations serve under the documented MV-snapshot contract,
    * session-local, exactly like the ANN side's unguarded entries. */
  private def sourceSignature(spark: SparkSession, sourcePath: String): String =
    if (Option(new org.apache.hadoop.fs.Path(sourcePath).toUri.getScheme)
        .exists(_ != "file")) ""
    else graft.ml.IndexCache.sourceFingerprint(normalize(sourcePath))

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
      // user-facing durable revocation.
      unregisterInMemory(sourcePath)
      spark.read.parquet(sourcePath)
        .groupBy(dims.map(col): _*)
        .agg(count(lit(1)).as("_cnt"),
          measures.flatMap(m => Seq(
            sum(col(m).cast(DecimalType(18, 3))).as(s"_sum_$m"),
            // per-measure NON-NULL count: avg divides by count(m), not
            // count(*) — a nullable measure would otherwise re-aggregate
            // to a silently smaller average (r16 review)
            count(col(m)).as(s"_cntm_$m"),
            // per-cell min/max re-aggregate exactly for ANY orderable
            // measure type (order-free semilattice — no decimal
            // discipline needed), serving min(price)/max(ts) dashboards
            min(col(m)).as(s"_min_$m"),
            max(col(m)).as(s"_max_$m"))): _*)
        .write.mode("overwrite").parquet(dest)
    }
    val entry = Entry(dest, dims, measures, sig)
    entries.synchronized {
      val k = normalize(sourcePath)
      entries.put(k, entry)
      verifiedAt(k) = System.currentTimeMillis()
      // a fresh registration invalidates a cached rehydration MISS for
      // the path (the register call's own build aggregation runs through
      // the rule and primes the miss cache before any record exists)
      rehydrateMissAt.remove(k)
    }
    if (sig.nonEmpty) persistRegistration(spark, normalize(sourcePath), entry)
    RollupRewriteRule.install(spark)
    entry
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

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  private def persistRegistration(spark: SparkSession, sourceKey: String,
      entry: Entry): Unit = scala.util.Try {
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
    val dir = new java.io.File(entry.rollupPath)
    val tmp = java.io.File.createTempFile("_registration", ".tmp", dir)
    java.nio.file.Files.write(tmp.toPath,
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(dir, RegistrationRel).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private final case class Reg(source: String, dims: Seq[String],
      measures: Seq[String], sourceSig: String)

  private def readRegistration(dir: java.io.File): Option[Reg] =
    scala.util.Try {
      val kv = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, RegistrationRel).toPath), "UTF-8")
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

  /** Rebuild a registration for `path` from a persisted record in the
    * default cache root — served only when the record's fact signature
    * matches the LIVE directory. None (TTL-cached) otherwise; the
    * aggregation keeps its exact fact scan. */
  def rehydrate(path: String,
      roots: Seq[String] = Seq(DefaultCacheRoot)): Option[Entry] = {
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
    val currentSig = scala.util.Try(
      sourceSignature(SparkSession.active, key)).getOrElse("")
    if (currentSig.isEmpty) return miss
    val candidates = roots.flatMap { root =>
      Option(new java.io.File(root).listFiles()).toSeq.flatten
        .filter(_.isDirectory)
        .flatMap { d =>
          val rec = new java.io.File(d, RegistrationRel)
          if (!rec.isFile) None
          else readRegistration(d)
            .filter(r => r.source == key && r.sourceSig == currentSig)
            .map(r => (d, rec.lastModified(), r))
        }
    }
    candidates.sortBy(-_._2).headOption match {
      case None => miss
      case Some((dir, _, r)) =>
        if (!new java.io.File(dir, "_SUCCESS").isFile) miss
        else {
          val entry = Entry(dir.getPath, r.dims, r.measures, r.sourceSig)
          entries.synchronized {
            entries.put(key, entry)
            verifiedAt(key) = now
          }
          Some(entry)
        }
    }
  }

  def lookup(path: String): Option[Entry] =
    entries.synchronized { entries.get(normalize(path)) }

  /** [[lookup]] plus the serve-time staleness guard (VERDICT r14 ask #2,
    * the [[AnnIndexRegistry.lookupFresh]] twin — MORE important here
    * because this rule claims EXACTNESS): before a registration serves,
    * its recorded fact signature is re-checked against the live
    * directory, TTL-cached; a fact rewritten in place without
    * re-registration deregisters and the aggregation keeps its exact
    * fact scan instead of silently re-aggregating stale cells. */
  def lookupFresh(path: String, ttlMs: Long): Option[Entry] = {
    val key = normalize(path)
    val e = lookup(path).getOrElse(return None)
    if (e.sourceSig.isEmpty) return Some(e)
    val now = System.currentTimeMillis()
    val fresh = entries.synchronized {
      verifiedAt.get(key).exists(t => now - t >= 0 && now - t < ttlMs)
    }
    if (fresh) return Some(e)
    scala.util.Try(sourceSignature(SparkSession.active, key)) match {
      case scala.util.Success(sig) if sig == e.sourceSig =>
        entries.synchronized { verifiedAt(key) = now }
        Some(e)
      case scala.util.Success(_) =>
        deregister(path)
        None
      // cannot-compute (transient FS error) fails closed for this serve
      // only — never a revocation on a cannot-know result
      case scala.util.Failure(_) => None
    }
  }

  private def unregisterInMemory(sourcePath: String): String =
    entries.synchronized {
      val k = normalize(sourcePath)
      entries.remove(k)
      verifiedAt.remove(k)
      k
    }

  /** Remove a registration — DURABLY (persisted records for this source
    * in the default root go too, so [[rehydrate]] cannot resurrect an
    * explicit revocation); `clear()` stays session-local by design. */
  def deregister(sourcePath: String): Unit = {
    val key = unregisterInMemory(sourcePath)
    scala.util.Try {
      Option(new java.io.File(DefaultCacheRoot).listFiles())
        .toSeq.flatten.filter(_.isDirectory)
        .foreach { d =>
          if (readRegistration(d).exists(_.source == key))
            new java.io.File(d, RegistrationRel).delete()
        }
    }
  }

  def clear(): Unit = entries.synchronized {
    entries.clear()
    verifiedAt.clear()
    rehydrateMissAt.clear()
  }

  /** Every rollup dir a live registration still references — the set
    * [[gc]] callers pass as `keep` so a sweep can never reclaim a dir
    * the next rewritten aggregation in this session would read (the
    * [[AnnIndexRegistry.livePaths]] twin). */
  def livePaths: Set[String] = entries.synchronized {
    entries.values.map(_.rollupPath).toSet
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
    // not compute (transient FS error) — never grounds for reclamation
    // on an EXISTING fact dir (the missing-dir case is checked apart)
    val sigCache = scala.collection.mutable.Map.empty[String, Option[String]]
    def liveSig(source: String): Option[String] =
      sigCache.getOrElseUpdate(source,
        scala.util.Try(sourceSignature(SparkSession.active, source)).toOption)
    Option(new java.io.File(cacheRoot).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("rollup_"))
      .foreach { d =>
        readRegistration(d).foreach { r =>
          val expectedKey = cacheKey(r.source, r.dims, r.measures, r.sourceSig)
          val stale =
            !new java.io.File(r.source).exists() ||
            liveSig(r.source).exists(_ != r.sourceSig) ||
            d.getName != s"rollup_$expectedKey"
          if (stale && now - d.lastModified() >= olderThanMs &&
              !keepAbs.contains(d.getAbsolutePath)) {
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
    * relation; returns (filter conjuncts, fact relation, registration). */
  private def walkToFact(start: LogicalPlan)
      : Option[(Seq[Expression], LogicalRelation, RollupRegistry.Entry)] = {
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
    RollupRegistry.lookupFresh(roots.head.toString, staleCheckMs)
      .orElse(RollupRegistry.rehydrate(roots.head.toString))
      .map((conds, rel, _))
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
    val (conds, rel, entry) = walkToFact(agg.child).getOrElse(return None)
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
    val (conds, _, entry) = walkToFact(expand.child).getOrElse(return None)
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
