package graft.ml

import graft.functions.TopKByScore
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Corpus-sized IVF geometry (VERDICT r12 ask #1): the registered ANN
 * queries must not pin `nCentroids = 8` — an 8-cell coarse quantizer
 * probes 7/8 of ANY corpus forever, so the indexed spelling never
 * amortizes at scale. This object is the production rule that sizes the
 * index FROM the corpus:
 *
 *  - `nCentroids` = the sqrt(N) IVF sizing (cells grow with the corpus,
 *    per-cell candidate volume stays ~sqrt(N), so probed work per query
 *    grows sub-linearly), BANDED to powers of two and CLAMPED to at
 *    least [[MinRowsPerCell]] rows per cell — see [[centroidsFor]] for
 *    why both of the literal rule's failure modes (per-ingest rebuild
 *    cadence at scale, routing overhead at fixture scale) need it;
 *  - `nProbe` = the smallest probe width whose MEASURED recall@k on a
 *    deterministic anchor sample meets the caller's contract — the
 *    published index-autotuning practice (pick the operating point on
 *    the recall/probe curve, don't guess it). On a uniform-random corpus
 *    the calibration honestly lands near full probing (no cluster
 *    structure to exploit — BitextClusteredSpec measures the clustered
 *    contract where the probed fraction is small); on a clustered corpus
 *    it lands at a small fraction of the cells. Either way the REGISTERED
 *    query serves whatever its corpus needs, at any scale.
 *
 * Cost shape: calibration is one anchor-sample exact top-k (|A| x N —
 * linear, |A| fixed) plus O(log nCentroids) probed searches over the
 * SAME |A| anchors. It runs once per (corpus, contract): the chosen
 * width is persisted as a sidecar inside the published index directory
 * (the index is fingerprint-keyed on corpus content + build params, so
 * a regenerated corpus recalibrates), and a session-level memo makes
 * repeat lookups free. `graft.Bench` prices the calibration cost as
 * `_shared_build:ann_geometry`.
 *
 * Reference anchor: the indexed escape from the brute-force scan of
 * MerkonMemoryStore.cs:133-146, now with the index actually sized to
 * the corpus instead of a fixture constant.
 */
object IvfGeometry {

  val MinCentroids = 8

  /** A cell must hold enough rows to amortize its own existence: opening
    * a cell directory (file handle, parquet footer, task schedule) costs
    * roughly as much as scanning ~100 rows, so a quantizer whose cells
    * are thinner pays more in routing/partition overhead than the
    * pruning returns. The floor is fit to two measurements, one on each
    * side: r13's sqrt-derived 45 cells of ~44 rows on the 2,000-row
    * fixture DOUBLED the `ann_indexed_*` walls (cells too thin), while
    * on the uniform 10x corpus 141 cells of ~142 rows measured 2.6x
    * FASTER than a 64-cell/312-row quantizer at the same recall contract
    * (cells already thick enough — a 256 floor overshot, r14 session
    * logs). 128 sits between the measured-bad 44 and the measured-good
    * 142. The clamp binds below N = MinRowsPerCell² = 16,384 rows and is
    * inert at scale, where sqrt(N) cells hold ~sqrt(N) >= 128 rows. */
  val MinRowsPerCell = 128

  /**
   * The banded corpus-sized coarse-quantizer sizing (r14, replacing the
   * literal `round(sqrt(N))` of r13): the target cell count is
   * `min(sqrt(N), N / MinRowsPerCell)` — sqrt-N IVF sizing with the
   * small-corpus clamp above — QUANTIZED to the nearest power of two
   * (round-half-up in log space: bump while target >= c*sqrt(2)), floored
   * at [[MinCentroids]].
   *
   * The power-of-two band is the growth hysteresis that keeps the APPEND
   * path reachable under ingest: `c` is constant while N moves inside a
   * ~4x band (sqrt regime; ~2x in the clamp regime), so a grown corpus
   * resolves to the SAME index params and [[IvfIndex.openOrBuildPath]]
   * rides `IndexCache`'s manifest-subset append (frozen centroids, no
   * KMeans re-fit) — only the cheap nProbe sidecar recalibrates. The
   * literal sqrt rule re-keyed the cache every ~2/sqrt(N) of relative
   * growth (at 10^9 rows, every ~0.006% of ingest), degenerating the
   * index job into a perpetual re-fit. A band-crossing growth (or any
   * changed/removed source file) still rebuilds — append never serves a
   * quantizer the corpus outgrew. GeometryGrowthSpec pins all three
   * behaviors.
   *
   * Determinism across engines: the bump condition `target >= c*sqrt(2)`
   * is evaluated as `target² >= 2c²`, where `target² =
   * min(N, (N/MinRowsPerCell)²)` is EXACT in doubles (an integer, or the
   * square of a dyadic rational) — no square roots or logarithms whose
   * last-ulp rounding could disagree with the DuckDB oracle's derivation
   * (`8 * 2^max(0, floor((log2(t2) - 5) / 2))`, exact at every integer
   * band boundary because t2 is exact).
   */
  def centroidsFor(n: Long): Int = {
    val nd = n.toDouble
    val t2 = math.min(nd, (nd / MinRowsPerCell) * (nd / MinRowsPerCell))
    var c = MinCentroids.toLong
    while (2.0 * c * c <= t2 && c < (1L << 30)) c *= 2
    c.toInt
  }

  /** KMeans wants ~this many training points per centroid before a
    * codebook stops overfitting its sample (the published faiss
    * clustering guidance — below it, warn-and-subsample territory). */
  val TrainPointsPerCentroid = 39

  /** Corpus-sized PQ codebook width: the standard 8-bit codebooks (256
    * centroids/subspace — byte-aligned codes, finer quantization) once
    * the per-subspace training set supports them at
    * [[TrainPointsPerCentroid]], else the small-corpus 16 (4-bit). The
    * same sized-FROM-the-corpus discipline as [[centroidsFor]], applied
    * to the other quantizer: a fixture-tuned 16 would stay coarse
    * forever at 100 TB, wasting the ADC scan's re-rank budget on
    * quantization error. */
  def codebookFor(n: Long): Int =
    if (n >= 256L * TrainPointsPerCentroid) 256 else 16

  /** Subspace count from the embedding dimension: 8-dim subvectors
    * (m = dim/8 → one byte per subspace at 256-wide codebooks, the
    * standard PQ compression point), floored at 1 and capped at dim. */
  def subspacesFor(dim: Int): Int =
    math.max(1, math.min(dim, dim / 8))

  /** ADC shortlist depth for a PQ-served top-k: the shortlist exists to
    * absorb quantized-score rank displacement, and displacement scales
    * with codebook coarseness — so the floor is 192 at the standard
    * 8-bit width (the published re-rank practice) and grows inversely
    * with the codebook for the small-corpus 4-bit shape, with an 8×k
    * lower bound for large k. Fit to a measurement, not guessed: at
    * kc=16 on the 2,000-row sf0.1 fixture (c=16, calibrated p=14 →
    * ~1,750 probed candidates) a 192-deep shortlist measured recall@10
    * 0.833 — BELOW the 0.9 family contract even though the cell probe
    * held 0.967 — while 384+ recovered the full IVF bound; coarse codes
    * simply cannot rank a deep candidate set that finely. The scaled
    * floor is inert at scale (codebookFor sizes real corpora to 256). */
  def shortlistFor(kCentroids: Int, k: Int): Int =
    math.max(8 * k, 192 * math.max(1, 256 / kCentroids))

  /**
   * A recall contract the calibrated probe width must meet: recall@k on
   * the anchor sample >= targetRecall. For a FILTERED consumer (allow-list
   * probes), size k to the unfiltered rank the filtered top-k lives at —
   * k_query / selectivity (a 50%-selective predicate's top-16 sits near
   * unfiltered rank 32) — instead of multiplying nProbe blindly.
   */
  final case class Contract(k: Int, targetRecall: Double, nAnchors: Int = 128) {
    require(k >= 1 && targetRecall > 0 && targetRecall <= 1 && nAnchors >= 1)
    /** Path-safe key of the contract for the persisted sidecar. The
      * trailing token versions the CALIBRATION ALGORITHM (anchor rule,
      * sweep) — bumping it orphans stale sidecars instead of serving a
      * width measured under a different sampling scheme. */
    def fingerprint: String =
      s"k$k-r${math.round(targetRecall * 1000)}-a$nAnchors-v2"
  }

  /** The store flagship's calibration contract (recall@10 ≥ 0.95 — the
    * reference's top-k query shape): ONE definition shared by the Scala
    * index job (`MerkonStore.buildIndex`) and the SQL CALL surface
    * (`MerkonCatalog`'s `build_index` procedure), so the two entry
    * points to the same job can never silently diverge on the parameter
    * they are documented to share. */
  val FlagshipContract: Contract = Contract(10, 0.95)

  /** A calibration result: the corpus-sized index plus the measured
    * recall at the chosen width (spec observability — regressions surface
    * with their magnitude, not just a flipped pass bit). */
  final case class Calibrated(ivf: IvfIndex, measuredRecall: Double) {
    def probeFraction: Double = ivf.nProbe.toDouble / ivf.nCentroids
  }

  /** Session memo: one calibration per (corpus CONTENT, contract, root).
    * The key carries [[IndexCache.sourceFingerprint]] — a corpus
    * rewritten at the same path within one session (the store's
    * mutate-then-`buildIndex` refresh workflow overwrites its snapshot
    * dump in place) must recalibrate, never be served the old corpus's
    * geometry. The fingerprint is a driver-side FS listing + head CRCs,
    * so a memo hit stays job-free. Values are tiny (a geometry + one
    * double); the build cost lands in the bench sidecar under
    * `_shared_build:ann_geometry`. */
  private val memo =
    new graft.util.SessionCache[(String, String, Contract, String), Calibrated](
      buildName = Some("ann_geometry"))

  /** The calibrated corpus-sized index for `sourcePath` — the entry
    * point registered queries use. Builds (or opens) the sqrt-N-cell
    * index via [[IvfIndex.openOrBuild]]'s fingerprint discipline, then
    * resolves nProbe from the sidecar or calibrates it. */
  def calibrated(spark: SparkSession, sourcePath: String, idCol: String,
      embCol: String, contract: Contract,
      cacheRoot: String = IndexCache.DefaultIvfRoot): Calibrated =
    // locality-aware content key (r17): a remote-scheme corpus keys on
    // the bounded-listing signature — the local walk listed nothing
    // there, so every state of a remote corpus shared one memo entry and
    // a rewritten corpus could be served the old geometry. Local paths
    // key on the identical fingerprint string as before.
    memo.getOrElseUpdate(spark,
      (sourcePath, IndexCache.sourceSignature(
        spark.sparkContext.hadoopConfiguration, sourcePath), contract,
        cacheRoot))(
      resolve(spark, sourcePath, idCol, embCol, contract, cacheRoot))

  /** [[calibrated]] returning just the index. */
  def calibratedIvf(spark: SparkSession, sourcePath: String, idCol: String,
      embCol: String, contract: Contract): IvfIndex =
    calibrated(spark, sourcePath, idCol, embCol, contract).ivf

  private def resolve(spark: SparkSession, sourcePath: String, idCol: String,
      embCol: String, contract: Contract, cacheRoot: String): Calibrated = {
    val corpus = spark.read.parquet(sourcePath)
    // size c from the TOTAL row count — the SAME number every other
    // centroidsFor consumer and the DuckDB oracle's count(*) closed
    // form derive, so the geometry agrees across paths even when
    // zero-norm rows exist (they only ever OVERSHOOT c by at most one
    // band, never change which index answers a query). r17: answered
    // from the parquet FOOTERS on the driver — a warm open previously
    // paid a scheduled Spark job here (and another for the zero-norm
    // probe below) per (corpus, contract) memo entry, ~0.5 s × 7
    // entries of pure job overhead per bench session; the footer walk
    // is the exact row count with no job. corpus.count() remains the
    // fallback for sources whose footers we cannot read.
    val c = centroidsFor(IndexCache.rowCountFromFooters(
        spark.sparkContext.hadoopConfiguration, sourcePath)
      .getOrElse(corpus.count()))
    val indexPath = IvfIndex.openOrBuildPath(spark, new IvfIndex(c, 1),
      sourcePath, idCol, embCol, cacheRoot)
    val sidecar = new java.io.File(indexPath, s"nprobe-${contract.fingerprint}")
    // a truncated/foreign sidecar (killed writer outside the atomic-move
    // window, stray bytes) must fall back to recalibration — rewriting
    // the file below — never crash every future query on this index with
    // a bare MatchError. Validity is structural: an in-range width and a
    // real measured recall.
    val fromSidecar =
      if (!sidecar.isFile) None
      else scala.util.Try {
        val Array(p, r) = new String(
          java.nio.file.Files.readAllBytes(sidecar.toPath), "UTF-8")
          .trim.split(' ')
        (p.toInt, r.toDouble)
      }.toOption.collect {
        case (p, r) if p >= 1 && p <= c && !r.isNaN =>
          Calibrated(new IvfIndex(c, p), r)
      }
    fromSidecar.getOrElse {
      // zero-norm fail-fast lives in IvfIndex.build (the cold branch);
      // a valid fingerprint-fresh sidecar proves the corpus calibrated
      // before, so the warm open stays job-free (r17)
      val out = calibrate(spark, IvfIndex.load(spark, indexPath), corpus,
        idCol, embCol, c, contract, indexPath)
      // publish atomically: a concurrent calibrator computes the same
      // deterministic answer, so either writer's file serves both
      val tmp = java.io.File.createTempFile("nprobe", ".tmp",
        new java.io.File(indexPath))
      java.nio.file.Files.write(tmp.toPath,
        s"${out.ivf.nProbe} ${out.measuredRecall}".getBytes("UTF-8"))
      java.nio.file.Files.move(tmp.toPath, sidecar.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      out
    }
  }

  /** The joint (exact_rank, cell_rank) pair histogram over the anchor
    * sample at a deep rank cap — the ONE artifact every contract on the
    * same index derives its calibration from (r18). `counts((r, cr))` =
    * number of (anchor, neighbor) pairs where the neighbor sits at exact
    * rank r (1-based, the (cos desc, id asc) total order) and its cell
    * at probe rank cr; cr = 0 marks pairs whose neighbor never matched a
    * probed cell (tombstoned-away — they count toward the denominator,
    * never the numerator, exactly as the per-contract histogram did). */
  private final case class JointHist(kCap: Int, counts: Map[(Int, Int), Long])

  /** One histogram per (index dir, anchor-rule, rank cap) and session:
    * the bench session calibrates SEVEN contracts against the embeddings
    * corpus (k = 3/4/6/10/12/32/40), and before r18 each paid its own
    * exact-top-k cross join + routing pass + histogram job — ~6 s × 7 of
    * identical work on a cold index (the driver's fresh-container runs
    * measured `_shared_build:ann_geometry` at 19-46 s). The contracts
    * share the anchor rule (same nAnchors => same deterministic sample),
    * and recall@k(p) is a prefix sum of the joint histogram (top-k is a
    * PREFIX of top-kCap under the total order — TopKProps' prefix
    * property), so one pass serves them all bit-identically and each
    * additional contract is driver-side arithmetic. No `buildName` here:
    * the build runs inside the outer memo's resolve, whose timer already
    * reports it to SharedBuilds — a second record would double-count. */
  private val histMemo =
    new graft.util.SessionCache[(String, Int, Int), JointHist]()

  /** Rank cap for a contract's k: one shared 64-deep histogram covers
    * every registered contract (max k = 40); a deeper k rounds up to the
    * next power of two so rare deep contracts share among themselves. */
  private def capFor(k: Int): Int = {
    var cap = 64
    while (cap < k) cap *= 2
    cap
  }

  /** Minimal nProbe meeting the contract: a prefix-sum walk over the
    * memoized joint histogram — recall(p) = |pairs with exact_rank <= k
    * and 1 <= cell_rank <= p| / |pairs with exact_rank <= k|, monotone in
    * p by construction. At p == c the probe is exhaustive, so the walk
    * always terminates with a passing width (or the tombstoned-away
    * fallback at p == c, as before). */
  private def calibrate(spark: SparkSession, built: IvfIndex.Built,
      corpus: DataFrame, idCol: String, embCol: String, c: Int,
      contract: Contract, indexPath: String): Calibrated = {
    val jh = histMemo.getOrElseUpdate(spark,
      (indexPath, contract.nAnchors, capFor(contract.k)))(
      buildJointHist(spark, built, corpus, idCol, embCol, c,
        contract.nAnchors, capFor(contract.k)))
    val k = contract.k
    // toSeq first: collecting (cr, n) pairs straight off the Map would
    // REBUILD a map and silently overwrite same-cr entries from
    // different exact ranks instead of summing them
    val pairs = jh.counts.toSeq
    val exactCount = pairs.collect {
      case ((r, _), n) if r <= k => n
    }.sum.toDouble
    require(exactCount > 0, "cannot calibrate IVF geometry: corpus has " +
      "no searchable (non-zero-norm) vectors")
    // per-probe-width increments for THIS k (cr = 0 = never-probed pairs
    // stay out of every numerator)
    val byCr = pairs.collect {
      case ((r, cr), n) if r <= k && cr >= 1 => (cr, n)
    }.groupBy(_._1).map { case (cr, xs) => cr -> xs.map(_._2).sum }
    var cum = 0L
    var hi = c
    var hiRecall = 0.0
    var p = 1
    var found = false
    while (p <= c) {
      cum += byCr.getOrElse(p, 0L)
      val r = cum / exactCount
      if (!found && r >= contract.targetRecall) { hi = p; hiRecall = r; found = true }
      if (p == c && !found) { hi = c; hiRecall = r } // tombstoned-away
      p += 1
    }
    Calibrated(new IvfIndex(c, hi), hiRecall)
  }

  /** ONE exact pass + ONE routing pass building [[JointHist]]: the r17
    * one-pass-per-contract sweep generalized across contracts (r18). */
  private def buildJointHist(spark: SparkSession, built: IvfIndex.Built,
      corpus: DataFrame, idCol: String, embCol: String, c: Int,
      nAnchors: Int, kCap: Int): JointHist = {
    // zero-norm vectors are structurally excluded from the index
    // (IvfIndex.prepare drops them) and their cosine is NaN — an exact
    // oracle that kept one would poison its top-k buffer and cap
    // measured recall below any target, breaking the "exhaustive probe
    // passes" termination guarantee. Calibrate over the searchable
    // corpus only. Ids go through a DETERMINISTIC LONG SURROGATE
    // (xxhash64): the bounded top-k aggregator is long-keyed, and the
    // store's collections carry STRING keys (the reference's shape) —
    // recall is id-representation-agnostic, and a 64-bit collision
    // (~n²/2⁶⁵) would only perturb one anchor's measured recall.
    val searchable = graft.util.Spread.byKey(corpus
      .filter(graft.functions.VectorFunctions.l2Norm(col(embCol)) > 0), idCol)
      .withColumn("__gid", xxhash64(col(idCol)))
    val builtS = IvfIndex.Built(
      built.assigned.withColumn("id", xxhash64(col("id"))),
      built.centroids,
      built.tombstones.map(_.withColumn("id", xxhash64(col("id")))))
    // anchor sample: hash-strided so anchors spread over the id space
    // (a head-of-ids sample would sit inside one cluster of a clustered
    // corpus and calibrate on unrepresentative geometry), deterministic
    // (Murmur3 fixed seed + id order), bounded at nAnchors rows. The
    // stride targets ~nAnchors expected survivors ACROSS THE WHOLE id
    // range, so the hard-bound limit trims only a small high-id tail —
    // a wider stride (2x anchors) would make the limit cut the top HALF
    // of the id space out of the sample.
    val n = searchable.count()
    // an empty (or all-zero-norm) corpus has no exact oracle rows, so
    // every recall would divide by zero and the sweep would persist a
    // NaN sidecar — fail fast with the actual cause
    require(n > 0, "cannot calibrate IVF geometry: corpus has no " +
      "searchable (non-zero-norm) vectors")
    val stride = math.max(1L, n / nAnchors)
    val anchors = searchable
      .filter(pmod(hash(col(idCol)), lit(stride)) === 0)
      .orderBy(col(idCol)).limit(nAnchors)
      .localCheckpoint()
    // anchors broadcast: the probe side is the corpus scan, never a
    // cartesian (QueriesSmokeSpec's no-CartesianProduct invariant holds
    // inside calibration too). Neighbor side is the searchable corpus —
    // the zero-norm exclusion above applies to BOTH sides of the oracle.
    // posexplode: position + 1 IS the neighbor's exact rank under the
    // (cos desc, id asc) total order (TopKByScore emits sorted), and a
    // contract's depth-k exact set is rows with exact_rank <= k — the
    // prefix property that lets one kCap-deep pass serve every contract.
    val exact = searchable
      .select(col("__gid").as("n_id"), col(embCol).as("n_emb"))
      .crossJoin(broadcast(anchors
        .select(col("__gid").as("q_id"), col(embCol).as("q_emb"))))
      .select(col("q_id"), col("n_id"),
        cosineSim(col("q_emb"), col("n_emb")).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKByScore(kCap)(col("cos"), col("n_id")).as("hits"))
      .select(col("q_id"), posexplode(col("hits.id")).as(Seq("r0", "neighbor_id")))
      .select(col("q_id"), (col("r0") + 1).as("exact_rank"), col("neighbor_id"))
    // no localCheckpoint on `exact` (r18): the joint histogram is its
    // ONLY consumer now — the old per-contract sweep re-read it per
    // recallAt probe, this pipeline reads it exactly once
    // ONE-pass sweep (r17): an exact neighbor n of anchor q is returned
    // by a width-p search IFF rank(q, cell(n)) <= p. (<=: ranks 1..p are
    // exactly the probed cells, and n — globally top-k by the total
    // order — survives the top-k cut of ANY candidate subset containing
    // it. =>: an unprobed cell's rows are never candidates.) So
    // recall@k(p) is a prefix sum of the (exact_rank, cell_rank) pair
    // histogram, bit-identical to recallAt(p) of the search path.
    // LEFT joins + per-pair MIN cell_rank (r18, ADVICE): a duplicated id
    // in the cell table (append/LWW races, surrogate collision) would
    // multiply inner-join rows and inflate recall above truth; the min
    // is "found via the earliest probed cell holding it" — identical on
    // healthy data, sound under duplication — and unmatched pairs land
    // in the cr = 0 bucket so they still count toward the denominator.
    val ranks = new IvfIndex(c, c).cellRanks(builtS, anchors, "__gid",
      embCol, c)
    val neighborCells = builtS.live
      .select(col("id").as("neighbor_id"), col("cell"))
    val counts = exact
      .join(neighborCells, Seq("neighbor_id"), "left")
      .join(ranks, Seq("q_id", "cell"), "left")
      .groupBy(col("q_id"), col("exact_rank"), col("neighbor_id"))
      .agg(min(col("cell_rank")).as("cr"))
      .groupBy(col("exact_rank"), coalesce(col("cr"), lit(0)).as("cr"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Number](0).intValue, r.getAs[Number](1).intValue) ->
        r.getLong(2))
      .toMap
    JointHist(kCap, counts)
  }
}
