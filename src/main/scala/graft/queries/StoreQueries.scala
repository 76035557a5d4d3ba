package graft.queries

import graft.QueryPack
import graft.functions.VectorFunctions.l2Norm
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver-checkable queries exercising each storage/query operator of the
 * reference (SURVEY.md §2.A/§2.B) as the exact plan shapes
 * [[graft.store.MerkonStore]] produces, expressed over the shared test
 * tables so the DuckDB oracle can replicate them:
 *
 *  - A2/B5 point get + embedding projection   -> store_point_get
 *  - B6 batch get (semi-join)                 -> store_batch_get
 *  - B7 batch remove (anti-join)              -> store_remove_batch
 *  - A9/B3/B4 upsert keep-latest (window)     -> store_upsert_keep_latest
 *  - A8 empty-key purge                       -> store_empty_key_purge
 *  - A4/B10 full scan + decode + projection   -> store_scan_project
 *  - B11 timestamp "u"-format codec           -> store_timestamp_codec
 *
 * Scale notes: point get and batch get push key predicates into the parquet
 * scan (row-group min/max + dictionary skip); semi/anti joins broadcast the
 * key set (a key list is always tiny relative to the collection); the upsert
 * window shuffles once on key — at 100 TB that single hash partitioning is
 * the unavoidable cost of global last-writer-wins and is reused by the
 * row_number.
 */
object StoreQueries extends QueryPack {

  /** The embeddings table viewed as a Merkon collection: key = vec_id. */
  private def coll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id").cast("string").as("key"), col("embedding"), col("label"))

  private val batchKeys = Seq("7", "19", "23", "111", "9999")
  private def batchKeysSql = batchKeys.map(k => s"'$k'").mkString(", ")

  /** One scratch warehouse per (session, tag): PROCESS-UNIQUE, so two
    * concurrent bench/verify sessions on one box can never clobber each
    * other's warehouses mid-query (the old fixed tmpdir paths could) —
    * yet stable WITHIN a session, because Spark caches a SQL catalog's
    * `warehouse` conf at first resolution, so a fresh dir per invocation
    * would dangle the cached catalog on re-runs. Queries still clear the
    * collections dir per invocation and delete-after-pin as before. */
  private val scratchDirs = new graft.util.SessionCache[String, String]()
  private def sessionScratch(s: SparkSession, tag: String): String =
    scratchDirs.getOrElseUpdate(s, tag)(
      graft.util.ExitScratch.register(
        java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString))

  /** Delete a scratch path AFTER the result that read it is pinned
    * (localCheckpoint) — the shared delete-after-pin discipline. The
    * cached [[sessionScratch]] name stays valid: the next invocation's
    * write recreates the directory. */
  private def dropScratch(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** The synthesized versioned mutation log (seq 0..2 of 'U'ploads and
    * 'D'elete tombstones over the collection) shared by `store_asof_read`
    * and `store_vacuum` — deterministic from vec_id so the DuckDB oracle
    * rebuilds it verbatim. */
  private def mutationLog(s: SparkSession, dir: String): DataFrame = {
    val base = coll(s, dir).select(col("key"), col("label"))
    val kl = col("key").cast("long")
    base
      .select(col("key"), col("label"), lit(0L).as("_seq"), lit("U").as("op"))
      .unionByName(base.filter(kl % 5 === 1)
        .select(col("key"), (col("label") + 1000).as("label"),
          lit(1L).as("_seq"), lit("U").as("op")))
      .unionByName(base.filter(kl % 5 === 2)
        .select(col("key"), lit(null).cast("int").as("label"),
          lit(1L).as("_seq"), lit("D").as("op")))
      .unionByName(base.filter(kl % 5 === 3)
        .select(col("key"), (col("label") + 2000).as("label"),
          lit(2L).as("_seq"), lit("U").as("op")))
  }

  override def queries: Map[String, Q] = Map(
    // The store's own collections hold `key` as a STORED string column,
    // so a point get pushes EqualTo(key, ...) straight into the scan.
    // This fixture view derives key by cast(vec_id), which parquet
    // pushdown cannot see through (Spark's UnwrapCastInBinaryComparison
    // only handles numeric↔numeric) — so the point get inverts the
    // literal through the cast by hand and filters the NATIVE column:
    // PushedFilters gets EqualTo(vec_id, 42) and the scan reads one
    // row-group instead of the collection (pinned by PlanRegressionSpec).
    "store_point_get" -> ((s, dir) =>
      t(s, dir, "embeddings").filter(col("vec_id") === lit(42L))
        .select(col("vec_id").cast("string").as("key"), col("label"))),

    "store_batch_get" -> ((s, dir) => {
      import s.implicits._
      val keyDf = batchKeys.toDF("key")
      coll(s, dir)
        .join(broadcast(keyDf), Seq("key"), "left_semi")
        .select(col("key"), col("label"), round6(l2Norm(col("embedding"))).as("emb_norm"))
        .orderBy(col("key"))
    }),

    "store_remove_batch" -> ((s, dir) => {
      import s.implicits._
      val keyDf = batchKeys.toDF("key")
      coll(s, dir)
        .join(broadcast(keyDf), Seq("key"), "left_anti")
        .agg(count(lit(1)).as("n_remaining"), sum(col("label")).as("label_sum"))
    }),

    "store_upsert_keep_latest" -> ((s, dir) => {
      val base = coll(s, dir).withColumn("_seq", lit(0L))
      val updates = coll(s, dir)
        .filter(col("key").cast("long") % 10 === 0)
        .withColumn("label", col("label") + 1000)
        .withColumn("_seq", lit(1L))
      val w = Window.partitionBy("key").orderBy(col("_seq").desc)
      base.unionByName(updates)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("key"), col("label"))
        .orderBy(col("key"))
    }),

    // MVCC time-travel read ("read the collection AS OF version V") —
    // the query-side complement of store_snapshot_diff: instead of
    // diffing two materialized snapshots, reconstruct ONE historical
    // snapshot from an append-only version log (write-version `_seq`,
    // op 'U'ploads and 'D'elete tombstones — the Delta/Iceberg log
    // model distilled to its relational core). Version 2 writes exist
    // in the log but are INVISIBLE at asOf=1, and version-1 tombstones
    // must suppress version-0 rows.
    //
    // Scale shape: the _seq<=V filter prunes log partitions at the scan
    // (a real log is partitioned by _seq), then latest-per-key is a
    // max(struct(_seq, …)) PARTIAL AGG — each task reduces its keys
    // locally and only one candidate row per (task, key) crosses the
    // shuffle, unlike the sort-the-world row_number spelling the LWW
    // upsert uses (there the window is the point; here the agg is).
    "store_asof_read" -> ((s, dir) => {
      mutationLog(s, dir).filter(col("_seq") <= 1)
        .groupBy(col("key"))
        .agg(max(struct(col("_seq"), col("op"), col("label"))).as("v"))
        .filter(col("v.op") =!= "D")
        .select(col("key"), col("v.label").as("label"),
          col("v._seq").as("version"))
        .orderBy(col("key"))
    }),

    // VACUUM — the retention pass that keeps a versioned mutation log
    // from growing without bound (the Delta/Iceberg VACUUM + log-compact
    // shape, and the missing lifecycle step after store_asof_read /
    // store_merge_cdc / store_snapshot_diff): at horizon v, every
    // pre-horizon row that a reader at or after v could still observe is
    // kept — i.e. exactly the LATEST _seq <= v row per key — and delete
    // tombstones at the horizon are folded away entirely (the key is
    // simply absent until a later re-insert). Post-horizon rows are
    // untouched, so asof(w) for any w >= v is IDENTICAL over the
    // vacuumed log — which is precisely what the oracle proves: the
    // retained row set is reproduced from scratch by DuckDB, so a vacuum
    // that dropped a still-visible row or kept a superseded one cannot
    // hash-match. Scale shape: one max(struct) PARTIAL AGG over the
    // pre-horizon slice (one candidate per task × key crosses the
    // shuffle) + a map-side seq filter — never a whole-log sort; at
    // 100 TB the pre-horizon slice is the old partitions of a
    // seq-partitioned log, read once and rewritten compacted.
    "store_vacuum" -> ((s, dir) => {
      val horizon = 1L
      val log = mutationLog(s, dir).localCheckpoint()
      val keepPre = log.filter(col("_seq") <= horizon)
        .groupBy(col("key"))
        .agg(max(struct(col("_seq"), col("op"), col("label"))).as("v"))
        .filter(col("v.op") =!= "D")
        .select(col("key"), col("v.label").as("label"),
          col("v._seq").as("_seq"), col("v.op").as("op"))
      keepPre.unionByName(log.filter(col("_seq") > horizon))
        .orderBy(col("key"), col("_seq"))
    }),

    // CDC merge: apply one change batch (inserts + updates + deletes) to
    // the collection snapshot in a SINGLE declarative plan — anti-join
    // the deletes, left-join + coalesce the updates, union the inserts.
    // The change batch is broadcast (a CDC batch is tiny next to the
    // snapshot); the snapshot side streams, so the merge is one pass at
    // any collection size. Change ops are derived deterministically from
    // vec_id (%7: 0=delete, 1=update label+1000, 2=insert re-keyed
    // +100000 with label+2000) so the oracle reproduces the batch.
    "store_merge_cdc" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
      val deletes = base.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").cast("string").as("key"))
      val updates = base.filter(col("vec_id") % 7 === 1)
        .select(col("vec_id").cast("string").as("key"),
          (col("label") + 1000).as("new_label"))
      val inserts = base.filter(col("vec_id") % 7 === 2)
        .select((col("vec_id") + 100000).cast("string").as("key"),
          (col("label") + 2000).as("label"))
      coll(s, dir)
        .join(broadcast(deletes), Seq("key"), "left_anti")
        .join(broadcast(updates), Seq("key"), "left")
        .select(col("key"), coalesce(col("new_label"), col("label")).as("label"))
        .unionByName(inserts)
        .agg(count(lit(1)).as("n_items"),
          sum(col("label").cast("long")).as("label_sum"),
          sum(when(col("label") >= 1000 && col("label") < 2000, 1L)
            .otherwise(0L)).as("n_updated"),
          sum(when(length(col("key")) >= 6, 1L).otherwise(0L)).as("n_inserted"))
    }),

    // Snapshot diff — the INVERSE of store_merge_cdc: reconstruct the
    // change batch between two collection versions (what a replication /
    // backup-validation job runs). One FULL OUTER join on key; rows
    // identical in both snapshots drop out, leaving insert/delete/update
    // ops. The "new" snapshot is the merge result of the same derived
    // CDC batch, so the diff must recover exactly that batch. At 100 TB
    // both snapshots hash-partition on key — and bucketed snapshot
    // tables diff with zero exchange (the BucketedJoinSpec path).
    "store_snapshot_diff" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
      val deletes = base.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").cast("string").as("key"))
      val updates = base.filter(col("vec_id") % 7 === 1)
        .select(col("vec_id").cast("string").as("key"),
          (col("label") + 1000).as("new_label"))
      val inserts = base.filter(col("vec_id") % 7 === 2)
        .select((col("vec_id") + 100000).cast("string").as("key"),
          (col("label") + 2000).as("label"))
      val newSnap = coll(s, dir)
        .join(broadcast(deletes), Seq("key"), "left_anti")
        .join(broadcast(updates), Seq("key"), "left")
        .select(col("key"), coalesce(col("new_label"), col("label")).as("label"))
        .unionByName(inserts)
      coll(s, dir).select(col("key"), col("label").as("old_label"))
        .join(newSnap.select(col("key"), col("label").as("new_label")),
          Seq("key"), "full_outer")
        .withColumn("op",
          when(col("old_label").isNull, "insert")
            .when(col("new_label").isNull, "delete")
            .when(col("old_label") =!= col("new_label"), "update"))
        .filter(col("op").isNotNull)
        .select(col("op"), col("key"), col("old_label"), col("new_label"))
        .orderBy(col("op"), col("key"))
    }),

    "store_empty_key_purge" -> ((s, dir) =>
      coll(s, dir)
        .withColumn("key",
          when(col("key").cast("long") % 97 === 0, lit("")).otherwise(col("key")))
        .filter(length(coalesce(col("key"), lit(""))) > 0)
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy(col("label"))),

    "store_scan_project" -> ((s, dir) =>
      coll(s, dir)
        .select(col("key"), col("label"), round6(l2Norm(col("embedding"))).as("emb_norm"))
        .orderBy(col("key"))),

    "store_timestamp_codec" -> ((s, dir) =>
      events(s, dir)
        .filter(col("event_id") < 50)
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss'Z'").as("ts_u"),
          to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss'Z'"),
            "yyyy-MM-dd HH:mm:ss'Z'").cast("long").as("ts_roundtrip_epoch"))
        .orderBy(col("event_id"))),

    // A10/A11 through the REFERENCE's own wire format: parquet -> store ->
    // the MessagePack .bin blob MerkonDatabase.Save writes -> merkon-legacy
    // DataSource V2 scan -> typed decode -> per-row norms. The oracle
    // recomputes the same rows straight from parquet, so the hash match is
    // a proof that keys, float embeddings (JSON string hop included), and
    // "u" timestamps survive the binary format losslessly. Bounded to 300
    // vectors because the blob is the reference's single in-memory file —
    // the interop path, not the data path (SCALE.md: store formats).
    "store_legacy_roundtrip" -> ((s, dir) => {
      import graft.store.MerkonStore
      val recs = t(s, dir, "embeddings")
        .filter(col("vec_id") < 300)
        .select(
          concat(lit("k"), lpad(col("vec_id").cast("string"), 6, "0")).as("key"),
          col("embedding"),
          to_timestamp(lit("2024-01-02 03:04:05")).as("timestamp"))
      val st = new MerkonStore(s)
      st.upsertBatch("rt", recs)
      val bin = sessionScratch(s, "legacy-rt") + "/blob.bin"
      st.exportLegacy(bin)
      val st2 = new MerkonStore(s)
      st2.importLegacy(bin)
      val out = st2.getAll("rt")
        .select(
          col("key"),
          round6(l2Norm(col("embedding"))).as("emb_norm"),
          date_format(col("timestamp"), MerkonStore.UFormat).as("ts_u"))
        .orderBy(col("key"))
        .localCheckpoint() // the merkon-legacy scan is lazy over the blob
      dropScratch(s, bin)
      out
    }),

    // Incremental materialized-view maintenance: refresh a per-customer
    // order rollup by merging the STANDING aggregate with a delta-batch
    // aggregate (orderkey mod 10 == 7 plays the newly-ingested batch) —
    // a full-outer join of two agg tables, counts added, exact DECIMAL
    // sums added. The oracle recomputes the rollup from scratch over all
    // orders, so the hash match IS the proof that incremental == full.
    // At 100 TB the refresh touches O(|delta| + |affected groups|) rows,
    // never the base table (the checkpointed MV stands in for the stored
    // aggregate); with the MV bucketed on the group key the merge join
    // is shuffle-free, the same discipline as store_snapshot_diff.
    "store_mv_incremental" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def rollup(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,3)")).as("tot"))
      val mv = rollup(o.filter(col("o_orderkey") % 10 =!= 7)).localCheckpoint()
      val delta = rollup(o.filter(col("o_orderkey") % 10 === 7))
      mv.select(col("o_custkey"), col("n").as("n0"), col("tot").as("t0"))
        .join(delta.select(col("o_custkey"), col("n").as("n1"),
          col("tot").as("t1")), Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("t0"), lit(0).cast("decimal(18,3)")) +
            coalesce(col("t1"), lit(0).cast("decimal(18,3)")))
            .cast("double").as("total_price"))
        .orderBy(col("o_custkey"))
    }),

    // JSONL interchange roundtrip — JSON Lines is the lingua franca of
    // LLM training corpora, so the engine must export and re-ingest it
    // losslessly. documents → .json (one object per line, Spark's JSONL
    // writer) → read back with an EXPLICIT schema (no inference pass —
    // at 100 TB schema inference is a full extra scan) → per-language
    // rollup whose text-content hash rider proves the escape/unescape
    // cycle preserved every byte. JSONL is line-splittable, so the
    // round-tripped read parallelizes exactly like the parquet scan;
    // the oracle computes the same rollup straight from the parquet
    // table, so the hash match IS the losslessness proof.
    // CSV interchange — the other line-splittable ingest staple. The
    // fixture text is CSV-benign, so a CSV-HOSTILE variant (embedded
    // comma + double quotes) is derived for every 7th doc before the
    // write: the write must quote those fields and escape the embedded
    // quotes, and the explicit-schema read must undo both. The oracle
    // derives the same variant from the parquet table and content-hashes
    // it, so any quoting/escaping loss (or a schema-inference drift —
    // the read is explicit-schema, no inference scan) breaks the hash.
    "source_csv_roundtrip" -> ((s, dir) => {
      val path = sessionScratch(s, "csv-rt") + "/data"
      val hostile = t(s, dir, "documents")
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(""", he said "ok"""")))
          .otherwise(col("text")))
      hostile.write.mode("overwrite").option("header", "true").csv(path)
      val back = s.read
        .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .option("header", "true").csv(path)
      val out = back.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
            .cast("long")).as("text_hash"))
        .orderBy(col("lang"))
        .localCheckpoint() // pin, then drop the CSV scratch
      dropScratch(s, path)
      out
    }),

    // ORC interchange — the other columnar on-disk format Spark ships
    // natively (a warehouse migrating to this engine arrives with ORC as
    // often as parquet). Same lossless-cycle proof as the JSONL/CSV
    // roundtrips: write ORC, explicit read, per-language rollup with a
    // content-hash rider; the oracle aggregates the parquet table
    // directly, so the hash match proves the ORC cycle byte-lossless.
    "source_orc_roundtrip" -> ((s, dir) => {
      val path = sessionScratch(s, "orc-rt") + "/data"
      t(s, dir, "documents").write.mode("overwrite").orc(path)
      val back = s.read.orc(path)
      val out = back.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
            .cast("long")).as("text_hash"))
        .orderBy(col("lang"))
        .localCheckpoint() // pin, then drop the ORC scratch
      dropScratch(s, path)
      out
    }),

    // Schema EVOLUTION read — the ingest reality a long-lived corpus
    // faces: early snapshot files lack columns later ones carry. Writes
    // two generations into one dataset dir (v1 = doc_id/lang only, even
    // ids; v2 adds text + n_chars, odd ids) and reads them UNIFIED via
    // parquet mergeSchema; v1 rows surface the added columns as NULL,
    // which the rollup makes driver-visible (n_with_text vs n_docs).
    // The oracle recomputes the same split from the parquet table, so a
    // read that dropped v1 rows, misaligned columns, or invented
    // non-null defaults cannot hash-match.
    "source_schema_evolution" -> ((s, dir) => {
      val path = sessionScratch(s, "evo") + "/data"
      val d = t(s, dir, "documents")
      d.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$path/gen=1")
      d.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$path/gen=2")
      val out = s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("text")).as("n_with_text"),
          sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
        .localCheckpoint() // pin, then drop the two-generation scratch
      dropScratch(s, path)
      out
    }),

    "source_jsonl_roundtrip" -> ((s, dir) => {
      val path = sessionScratch(s, "jsonl-rt") + "/data"
      t(s, dir, "documents").write.mode("overwrite").json(path)
      val back = s.read
        .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .json(path)
      val out = back.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
            .cast("long")).as("text_hash"))
        .orderBy(col("lang"))
        .localCheckpoint() // pin, then drop the JSONL scratch
      dropScratch(s, path)
      out
    }),

    // Write-time constraint enforcement (Delta CHECK-constraint /
    // expectations shape): declared row-level rules evaluated in ONE
    // map-only pass over the ingest batch, per-rule violation counts
    // plus the quarantine metric (rows violating ANY rule — a union,
    // not a sum: one row can break several rules). This is the gate a
    // store runs BEFORE upsert: violators route to quarantine, the
    // audit table is what the operator alarms on. Map-only + single
    // 5-column agg ⇒ no shuffle at all at any batch size; the explode
    // at the end is over one 5-element row.
    // Write-audit-publish — the staged-commit protocol (Iceberg's WAP
    // pattern) that turns store_constraint_audit from a report into a
    // GATE: each batch lands in an isolated staging dir, the audit runs
    // against the staged files, and only a clean batch is PUBLISHED via
    // a filesystem rename (atomic dir move — readers of the published
    // root never see a half-written or dirty batch). Here batch A is
    // clean and publishes; batch B carries constraint violators and
    // stays quarantined in staging. The oracle derives the final
    // published state (clean batch only) plus the per-batch verdicts —
    // a leaked dirty row, a lost clean one, or a mis-verdict all fail
    // the hash.
    "store_write_audit_publish" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val hfs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      val wh = java.nio.file.Files.createTempDirectory("graft_wap").toString
      val o = t(s, dir, "orders")
      def runWap(df: org.apache.spark.sql.DataFrame, name: String): Boolean = {
        val staged = s"$wh/stage/$name"
        df.write.mode("overwrite").parquet(staged)
        // the audit reads the STAGED FILES, not the input frame: what is
        // validated is exactly what would be published
        val nViol = s.read.parquet(staged)
          .filter(col("o_totalprice") > 400000).count()
        val ok = nViol == 0
        if (ok) {
          hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$wh/published"))
          hfs.rename(new org.apache.hadoop.fs.Path(staged),
            new org.apache.hadoop.fs.Path(s"$wh/published/$name"))
        }
        ok
      }
      val pubA = runWap(o.filter(col("o_orderkey") % 10 === 4 &&
        col("o_totalprice") <= 400000), "batch_a")
      val pubB = runWap(o.filter(col("o_orderkey") % 10 === 7), "batch_b")
      val out = s.read.option("recursiveFileLookup", "true")
        .parquet(s"$wh/published")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
            .as("total"))
        .select(col("o_orderstatus"), col("n"), col("total"),
          lit(pubA).as("batch_a_published"), lit(pubB).as("batch_b_published"))
        .orderBy(col("o_orderstatus"))
        // pin, then drop the staging+published scratch (no tmpdir litter)
        .localCheckpoint()
      hfs.delete(new org.apache.hadoop.fs.Path(wh), true)
      out
    }),

    // Change-data-feed read (Delta CDF's table_changes shape) over the
    // shared versioned mutation log: the NET per-key change between two
    // versions — update_preimage/update_postimage pairs, deletes with
    // their last-visible row, inserts (none in this log: every key
    // exists at v0; the arm is the symmetric mirror of delete) — and
    // crucially NOTHING for untouched keys or churn that nets out, which
    // is what makes a CDF consumer cheaper than a snapshot diff of raw
    // log rows. Shape: two keep-latest partial aggs + ONE full-outer
    // join on key; the change classification is a map-side expression.
    "store_cdf_read" -> ((s, dir) => {
      def stateAt(v: Int) = mutationLog(s, dir).filter(col("_seq") <= v)
        .groupBy(col("key"))
        .agg(max(struct(col("_seq"), col("op"), col("label"))).as("v"))
        .filter(col("v.op") =!= "D")
        .select(col("key"), col("v.label").as("label"))
      val s0 = stateAt(0).select(col("key"), col("label").as("l0"))
      val s2 = stateAt(2).select(col("key"), col("label").as("l2"))
      s0.join(s2, Seq("key"), "full_outer")
        .select(col("key"), explode(
          when(col("l0").isNull,
            array(struct(lit("insert").as("_change_type"),
              col("l2").as("label"))))
          .when(col("l2").isNull,
            array(struct(lit("delete").as("_change_type"),
              col("l0").as("label"))))
          .when(col("l0") =!= col("l2"),
            array(
              struct(lit("update_preimage").as("_change_type"),
                col("l0").as("label")),
              struct(lit("update_postimage").as("_change_type"),
                col("l2").as("label"))))
          .otherwise(lit(null))).as("c"))
        .select(col("key"), col("c._change_type").as("_change_type"),
          col("c.label").as("label"))
        .orderBy(col("key"), col("_change_type"))
    }),

    // Aggregate navigation in action ([[graft.plans.RollupRewriteRule]],
    // the second registered-artifact optimizer rule next to the ANN
    // rewrite): the query code below is the NAIVE dashboard plan — scan
    // the fact, filter a dim, GROUP BY a dim, count + exact-decimal sum
    // — and the rule serves it from the registered pre-aggregated rollup
    // (count(1) → sum(_cnt), sum(dec) → sum(_sum_m), dim filter remapped)
    // without touching the fact. COUNT and DECIMAL SUM re-aggregate
    // exactly, so unlike the ANN rewrite this one is EXACT: the oracle
    // hash over the rewritten plan's rows proves it, and the `rewritten`
    // bit (rollup-only `_cnt` in the executed scan's schema) proves the
    // fact scan was actually replaced. Soundness fences (raw double sums,
    // non-dim groupings/filters, distinct aggs never match; kill switch)
    // are pinned by RollupRewriteSpec.
    "store_rollup_rewrite" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val factPath = s"$dir/orders.parquet"
      graft.plans.RollupRegistry.register(s, factPath,
        dims = Seq("o_orderstatus", "o_orderpriority"),
        measures = Seq("o_totalprice"))
      val naive = s.read.parquet(factPath)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
            .as("total"))
      val rewritten = naive.queryExecution.executedPlan.toString
        .contains("_cnt")
      naive.select(col("o_orderstatus"), col("n"), col("total"),
          lit(rewritten).as("rewritten"))
        .orderBy(col("o_orderstatus"))
    }),

    // min/max/avg navigation (VERDICT r15 ask #5): the rollup's per-cell
    // _min_/_max_ columns re-aggregate EXACTLY for any orderable measure
    // (order-free idempotent semilattice — no decimal discipline
    // needed), and the exact-decimal avg decomposes into the sum and
    // count the rollup already stores, divided at Spark's own Average
    // types (sum at DECIMAL(28,3), count at DECIMAL(20,0), result cast
    // to DECIMAL(22,7)) so the scale-7 half-up rounding is bit-identical
    // to the fact scan. The oracle reproduces that rounding with integer
    // arithmetic (DuckDB's own decimal division is floating-point). The
    // `rewritten` bit (rollup-only `_min_` in the executed plan) proves
    // the fact scan was replaced; fences (raw double sums/avgs, filtered
    // dim subsets, v1 rollup dirs without min/max columns) live in
    // RollupRewriteSpec.
    "store_rollup_rewrite_minmax" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val factPath = s"$dir/orders.parquet"
      graft.plans.RollupRegistry.register(s, factPath,
        dims = Seq("o_orderstatus", "o_orderpriority"),
        measures = Seq("o_totalprice"))
      val naive = s.read.parquet(factPath)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          avg(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
            .as("avg_price"))
      val rewritten = naive.queryExecution.executedPlan.toString
        .contains("_min_")
      naive.select(col("o_orderstatus"), col("min_price"), col("max_price"),
          col("avg_price"), lit(rewritten).as("rewritten"))
        .orderBy(col("o_orderstatus"))
    }),

    // EXPRESSION navigation (r16): outputs wrapping the rewritable
    // aggregates in deterministic scalar arithmetic — sum/count,
    // count·k, max - min, the shapes real dashboards compute — rewrite
    // by replacing the embedded aggregates and keeping the scalar
    // structure verbatim (value-exact: the aggregates re-aggregate
    // identically and double arithmetic over identical operands is
    // deterministic). Nondeterministic wrappers decline
    // (RollupRewriteSpec).
    "store_rollup_rewrite_expr" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val factPath = s"$dir/orders.parquet"
      graft.plans.RollupRegistry.register(s, factPath,
        dims = Seq("o_orderstatus", "o_orderpriority"),
        measures = Seq("o_totalprice"))
      val naive = s.read.parquet(factPath)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(
          (sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double") /
            count(lit(1))).as("avg_unit"),
          (count(lit(1)) * 2).as("n2"),
          (max(col("o_totalprice")) - min(col("o_totalprice")))
            .as("price_range"))
      val rewritten = naive.queryExecution.executedPlan.toString
        .contains("_min_")
      naive.select(col("o_orderstatus"), col("avg_unit"), col("n2"),
          col("price_range"), lit(rewritten).as("rewritten"))
        .orderBy(col("o_orderstatus"))
    }),

    // Grouping-sets navigation (VERDICT r10 ask #7): the same registered
    // rollup serves a CUBE — all 2^2 grouping-set marginals — because
    // COUNT/DECIMAL-SUM re-aggregate exactly per set. The naive plan is
    // Aggregate over Expand over the fact scan; the rule rebuilds the
    // Expand over the rollup's cells with the grouping-id skeleton
    // untouched, so grand totals, both one-dim marginals, and the full
    // cells all come out of kilobytes of pre-aggregated state. The
    // `rewritten` bit (rollup-only `_cnt` in the executed plan) proves
    // the fact scan was replaced; the oracle hash proves every marginal
    // is still exact.
    "store_rollup_rewrite_cube" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val factPath = s"$dir/orders.parquet"
      graft.plans.RollupRegistry.register(s, factPath,
        dims = Seq("o_orderstatus", "o_orderpriority"),
        measures = Seq("o_totalprice"))
      val naive = s.read.parquet(factPath)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
            .as("total"))
      val rewritten = naive.queryExecution.executedPlan.toString
        .contains("_cnt")
      naive.select(col("o_orderstatus"), col("o_orderpriority"),
          col("n"), col("total"), lit(rewritten).as("rewritten"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // MULTIPLE rollups per fact (r17): a real BI deployment registers
    // several dim sets over one fact (dashboard on one dim, drill-down
    // on two) and the rule picks the best match per query — the Calcite
    // materialized-view-navigation shape. Both registrations below
    // coexist (the pre-r17 registry held ONE entry per path; a second
    // register replaced the first); the by-status query can only be
    // served by the two-dim shape, the by-priority query matches both
    // and must ride the one-dim shape (fewest dims = fewest cells —
    // `narrow_served` reads the executed scan's schema: the one-dim
    // cells carry no o_orderstatus column). Exactness per shape is the
    // same count/decimal-sum argument as ever; the oracle hash proves
    // both served aggregates.
    "store_rollup_rewrite_multi" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val factPath = s"$dir/orders.parquet"
      graft.plans.RollupRegistry.register(s, factPath,
        dims = Seq("o_orderstatus", "o_orderpriority"),
        measures = Seq("o_totalprice"))
      graft.plans.RollupRegistry.register(s, factPath,
        dims = Seq("o_orderpriority"), measures = Seq("o_totalprice"))
      def agg(d: String) = s.read.parquet(factPath)
        .groupBy(col(d))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
            .as("total"))
      val byStatus = agg("o_orderstatus")
      val byPriority = agg("o_orderpriority")
      val wideServed = byStatus.queryExecution.executedPlan.toString
        .contains("_cnt")
      val pPlan = byPriority.queryExecution.executedPlan.toString
      val narrowServed = pPlan.contains("_cnt") &&
        !pPlan.contains("o_orderstatus")
      byStatus.select(lit("by_status").as("q"),
          col("o_orderstatus").as("key"), col("n"), col("total"),
          lit(wideServed).as("rewritten"), lit(narrowServed).as("narrow_served"))
        .unionByName(byPriority.select(lit("by_priority").as("q"),
          col("o_orderpriority").as("key"), col("n"), col("total"),
          lit(narrowServed).as("rewritten"), lit(narrowServed).as("narrow_served")))
        .orderBy(col("q"), col("key"))
    }),

    // O(delta) rollup refresh (VERDICT r16 ask #1 — the rollup twin of
    // the ANN side's syncDump): a re-register over a fact whose recorded
    // file manifest is a strict SUBSET of the live files (the insert-only
    // mutation wave) aggregates the DELTA FILES ALONE and merges them
    // into the existing cells — counts/sums/_cntm add, min/max
    // semilattice-merge, the store_mv_incremental fold — instead of
    // rescanning the whole fact. Value-equality with a from-scratch
    // build is BY CONSTRUCTION (every cell column is an order-free
    // commutative monoid) and proven here end to end: the fact is built
    // as base (3/4 of orders) + appended delta (1/4), the second
    // register takes the incremental path (`incremental` bit from
    // lastBuildKind), and the oracle hash over the SERVED aggregation
    // equals DuckDB's full-fact aggregate. At a daily-appending 100 TB
    // fact this turns the per-mutation refresh bill from a full rescan
    // into |delta files| + |cells| (measured in SCALE.md). A
    // delete/update wave keeps the full rebuild — min/max cannot
    // retract (RollupRewriteSpec pins both classifications).
    "store_rollup_refresh_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val scratch = sessionScratch(s, "rollup-incr")
      val fact = s"$scratch/fact"
      val cacheRoot = s"$scratch/rollups"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val dims = Seq("o_orderstatus", "o_orderpriority")
      orders.filter(col("o_orderkey") % 4 =!= 0)
        .write.mode("overwrite").parquet(fact)
      graft.plans.RollupRegistry.register(s, fact, dims,
        measures = Seq("o_totalprice"), cacheRoot = cacheRoot)
      // insert-only wave: append writes NEW part files only
      orders.filter(col("o_orderkey") % 4 === 0)
        .write.mode("append").parquet(fact)
      graft.plans.RollupRegistry.register(s, fact, dims,
        measures = Seq("o_totalprice"), cacheRoot = cacheRoot)
      val incremental =
        graft.plans.RollupRegistry.lastBuildKind == "incremental"
      val naive = s.read.parquet(fact)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
            .as("total"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
      val rewritten = naive.queryExecution.executedPlan.toString
        .contains("_cnt")
      val out = naive.select(col("o_orderstatus"), col("o_orderpriority"),
          col("n"), col("total"), col("min_price"), col("max_price"),
          lit(rewritten).as("rewritten"), lit(incremental).as("incremental"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
        .localCheckpoint() // pin, then drop the fact + rollup scratch
      graft.plans.RollupRegistry.deregister(fact)
      dropScratch(s, scratch)
      out
    }),

    // Idempotent backfill via DYNAMIC partition overwrite (Hive's
    // INSERT OVERWRITE ... PARTITION semantics): re-running a corrected
    // day replaces exactly that day's files and leaves every other
    // partition byte-untouched — the reprocessing primitive a 100 TB
    // date-partitioned lake runs daily. The revised day doubles its
    // values (×2 is exact in binary, so the oracle reproduces it); the
    // hash proves BOTH halves: the revised day carries the corrected
    // sums AND the untouched days still exist — static overwrite mode
    // (which deletes every partition first) or a double-write would
    // each fail the compare.
    "store_partition_overwrite" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val wh = java.nio.file.Files.createTempDirectory("graft_overwrite")
        .toString
      val path = s"$wh/events_by_date"
      val ev = events(s, dir).withColumn("event_date", to_date(col("ts")))
      ev.write.partitionBy("event_date").mode("overwrite").parquet(path)
      val minDay = ev.agg(min(col("event_date"))).head.getDate(0)
      ev.filter(col("event_date") === lit(minDay))
        .withColumn("value", col("value") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date").parquet(path)
      val out = s.read.parquet(path)
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 3))).cast("double")
            .as("total_value"))
        .select(col("event_date").cast("timestamp").as("event_day"),
          col("n"), col("total_value"),
          (col("event_date") === lit(minDay)).as("revised"))
        .orderBy(col("event_day"))
        // pin the per-day rows eagerly, then drop the scratch table —
        // same no-tmpdir-litter discipline as layout_compaction_apply
        .localCheckpoint()
      new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh), true)
      out
    }),

    // PERMISSIVE-mode JSON parsing with corrupt-record quarantine — the
    // text-source twin of multimodal_ingest_gate: every 11th serialized
    // record is truncated mid-value (malformed JSON), and the parser
    // must salvage nothing from it (all-null fields + the raw line in
    // _corrupt_record) while parsing the rest losslessly. The oracle
    // predicts both halves from the corruption rule; a parser that
    // half-salvages a corrupt line or drops a good one fails the hash.
    // Map-only at any scale — this is exactly how a 100 TB JSONL ingest
    // quarantines poison lines without dying (FAILFAST) or silently
    // swallowing them (DROPMALFORMED).
    "source_json_corrupt_quarantine" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType),
        StructField("_corrupt_record", StringType)))
      t(s, dir, "documents")
        .select(col("doc_id").as("gen_id"),
          to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("raw"))
        .withColumn("raw",
          when(col("gen_id") % 11 === 0,
            expr("substring(raw, 1, length(raw) - 3)")).otherwise(col("raw")))
        .select(col("gen_id"), from_json(col("raw"), schema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
        .select(col("gen_id"), col("p.doc_id").as("doc_id"),
          col("p.lang").as("lang"), col("p.n_chars").as("n_chars"),
          col("p._corrupt_record").isNull.as("ok"))
        .orderBy(col("gen_id"))
    }),

    // Incremental maintenance of a JOIN view (the delta-rule companion
    // to store_mv_incremental's aggregate view): with base updates ΔA
    // (new orders) and ΔB (new lineitems), the join view refreshes as
    // J ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the standing A⋈B is NEVER recomputed,
    // which at 100 TB is the whole point: each delta term equi-joins a
    // batch-sized delta against a standing table (broadcast the delta,
    // stream the big side), then the per-order aggregate merges via the
    // same full_outer count/sum fold as the aggregate MV. The oracle is
    // the from-scratch join — the hash match PROVES incremental == full,
    // including the ΔA⋈ΔB cross term a naive two-term refresh drops.
    "store_mv_join_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val one = lit(1).cast(DecimalType(4, 3))
      val rev = col("l_extendedprice").cast(DecimalType(18, 3)) *
        (one - col("l_discount").cast(DecimalType(4, 3)))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val (aOld, dA) = (o.filter(col("o_orderkey") % 10 =!= 7),
        o.filter(col("o_orderkey") % 10 === 7))
      val (bOld, dB) = (li.filter(col("l_suppkey") % 10 =!= 3),
        li.filter(col("l_suppkey") % 10 === 3))
      def agg(j: org.apache.spark.sql.DataFrame) = j
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(rev).as("r"))
      val on = col("o_orderkey") === col("l_orderkey")
      val mv = agg(aOld.join(bOld, on)).localCheckpoint()
      val deltaAgg = agg(
        broadcast(dA).join(bOld, on)
          .unionByName(aOld.join(broadcast(dB), on))
          .unionByName(broadcast(dA).join(dB, on)))
      mv.select(col("o_orderkey"), col("n").as("n0"), col("r").as("r0"))
        .join(deltaAgg.select(col("o_orderkey"), col("n").as("n1"),
          col("r").as("r1")), Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
            .as("n_items"),
          (coalesce(col("r0"), lit(0).cast(DecimalType(28, 6))) +
            coalesce(col("r1"), lit(0).cast(DecimalType(28, 6))))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderkey"))
    }),

    "store_constraint_audit" -> ((s, dir) => {
      val ok = Map(
        "totalprice_max" -> (col("o_totalprice") <= 400000),
        "status_domain" -> col("o_orderstatus").isin("O", "F"),
        "date_horizon" -> (col("o_orderdate") < lit("2001-01-01").cast("timestamp")),
        "custkey_not_null" -> col("o_custkey").isNotNull)
      val viol = ok.map { case (n, c) =>
        sum(when(!coalesce(c, lit(false)), 1L).otherwise(0L)).as(n) }.toSeq
      val anyViol = sum(when(
        ok.values.map(c => !coalesce(c, lit(false))).reduce(_ || _), 1L)
        .otherwise(0L)).as("quarantined")
      val a = t(s, dir, "orders")
        .agg(count(lit(1)).as("n_rows"), viol :+ anyViol: _*)
      a.select(col("n_rows"), explode(array(
          (ok.keys.toSeq.sorted.map(n =>
            struct(lit(n).as("rule"), col(n).as("n_violations"))) :+
            struct(lit("_any_rule").as("rule"),
              col("quarantined").as("n_violations"))): _*)).as("r"))
        .select(col("r.rule").as("rule"), col("r.n_violations"),
          col("n_rows"),
          round6(col("r.n_violations") / col("n_rows")).as("violation_rate"))
        .orderBy(col("rule"))
    }),

    // The store-facade compaction end-to-end (VERDICT r10 ask #6): a
    // collection fragmented by six SQL INSERT appends is bin-packed by
    // MerkonStore.compactSaved — only the under-sized files rewritten,
    // one task per bin — and read back through the same catalog table.
    // `fragmented_ok` proves the appends really produced >= 6 data
    // files; `compacted_one_file` counts the post-compact directory off
    // the filesystem; the per-label aggregate hash proves the rewrite
    // lost/duplicated nothing. This is the A11 replacement story as a
    // driver-checked query: the reference rewrites the WHOLE database
    // blob per save (MerkonDatabase.cs:149-162), the facade rewrites
    // exactly the small-file bins.
    "store_compact_facade" -> ((s, dir) => {
      val store = new graft.store.MerkonStore(s)
      val wh = sessionScratch(s, "compact-facade")
      val whPath = new org.apache.hadoop.fs.Path(s"$wh/collections")
      val fs = whPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(whPath, true)
      store.attachSqlCatalog("merkon_cf", wh)
      s.sql("CREATE TABLE merkon_cf.emb_frag (key STRING, label INT)")
      (0 until 6).foreach { i =>
        s.sql("INSERT INTO merkon_cf.emb_frag " +
          s"SELECT CAST(vec_id AS STRING), label " +
          s"FROM parquet.`$dir/embeddings.parquet` WHERE vec_id % 6 = $i")
      }
      val colDir = new org.apache.hadoop.fs.Path(
        s"$wh/collections/c-emb_frag")
      def nFiles = fs.listStatus(colDir).count(st => st.isFile &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      val fragmentedOk = nFiles >= 6
      store.compactSaved(wh, "emb_frag", targetBytes = 1L << 30)
      val oneFile = nFiles == 1
      val out = s.sql("SELECT label, count(*) AS n_keys, " +
          "sum(CAST(key AS BIGINT)) AS key_sum FROM merkon_cf.emb_frag " +
          "GROUP BY label")
        .select(col("label"), col("n_keys"), col("key_sum"),
          lit(fragmentedOk).as("fragmented_ok"),
          lit(oneFile).as("compacted_one_file"))
        .orderBy(col("label"))
        .localCheckpoint() // pin, then drop the scratch warehouse
      fs.delete(new org.apache.hadoop.fs.Path(wh), true)
      out
    }),

    // Collection DDL from PURE SQL (VERDICT r10 ask #2) — A1 AddCollection,
    // A3 GetCollections, A5 IsCollectionExists, A6 RemoveCollection
    // (MerkonDatabase.cs:18-56) driven through CREATE/SHOW/DROP TABLE on
    // the [[graft.store.MerkonCatalog]] V2 TableCatalog, the way
    // `knn_topk_sql` proves the query surface. The INSERT and the final
    // SELECT run through Spark's own DSv2 parquet table (full pushdown),
    // so the verdict rows are real data read back from a catalog-created
    // collection, with the DDL-observable counters (table counts before/
    // after DROP, LIKE-existence bits) riding every row — DuckDB predicts
    // all of it from `documents` plus the DDL contract.
    // The rollup lifecycle from PURE SQL (VERDICT r16 ask #2 — closing
    // the asymmetry where a SQL-only user could gc_rollup_cache rollups
    // they could never CREATE): CALL build_rollup registers the cells
    // for a fact path, after which a pure-SQL GROUP BY over
    // parquet.`path` is cell-served (the `rewritten` plan bit), CALL
    // rollup_stats reports the registered state (dims/measures/cells/
    // guarded — the "kilobytes serve the dashboard" number made
    // inspectable), and the oracle hash proves the served aggregate is
    // still exact. The build_index/index_stats twins have existed since
    // r14; this is the rollup side of that procedure surface.
    "store_rollup_procedure_sql" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val scratch = sessionScratch(s, "rollup-proc")
      val fact = s"$scratch/fact"
      s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") % 3 === 0)
        .write.mode("overwrite").parquet(fact)
      val store = new graft.store.MerkonStore(s)
      store.attachSqlCatalog("merkon_rproc", s"$scratch/wh")
      val built = s.sql("CALL merkon_rproc.system.build_rollup(" +
        s"'$fact', 'o_orderstatus', 'o_totalprice')").collect().head
      val stats = s.sql(
        s"CALL merkon_rproc.system.rollup_stats('$fact')").collect().head
      val naive = s.read.parquet(fact)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
            .as("total"))
      val rewritten = naive.queryExecution.executedPlan.toString
        .contains("_cnt")
      val out = naive.select(col("o_orderstatus"), col("n"), col("total"),
          lit(rewritten).as("rewritten"),
          lit(built.getString(1)).as("build_kind"),
          lit(stats.getString(1)).as("dims"),
          lit(stats.getString(2)).as("measures"),
          lit(built.getLong(2) > 0 &&
            stats.getLong(3) == built.getLong(2)).as("cells_ok"),
          lit(built.getBoolean(3) && stats.getBoolean(5)).as("guarded"))
        .orderBy(col("o_orderstatus"))
        .localCheckpoint() // pin, then drop the scratch fact + orphan cells
      graft.plans.RollupRegistry.deregister(fact)
      dropScratch(s, scratch)
      // the fact is gone, so this run's default-root cells are orphans:
      // reclaim them through the same SQL surface (live registrations of
      // other queries are in the keep set; their dirs survive)
      s.sql("CALL merkon_rproc.system.gc_rollup_cache('', 0L)").collect()
      out
    }),

    "store_ddl_sql" -> ((s, dir) => {
      val store = new graft.store.MerkonStore(s)
      val wh = sessionScratch(s, "ddl-store")
      // fresh warehouse per invocation: the catalog instance is cached per
      // session but lists the directory dynamically, so clearing the dir
      // resets state and keeps the query idempotent across bench reruns
      val whPath = new org.apache.hadoop.fs.Path(s"$wh/collections")
      val fs = whPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(whPath, true)
      store.attachSqlCatalog("merkon_sql", wh)
      s.sql("CREATE TABLE merkon_sql.docs_slice (key STRING, lang STRING, n_chars BIGINT)")
      s.sql("CREATE TABLE merkon_sql.scratch (key STRING)")
      val afterCreate = s.sql("SHOW TABLES IN merkon_sql").count()
      s.sql(s"INSERT INTO merkon_sql.docs_slice " +
        s"SELECT CAST(doc_id AS STRING), lang, n_chars " +
        s"FROM parquet.`$dir/documents.parquet` WHERE doc_id % 7 = 0")
      s.sql("DROP TABLE merkon_sql.scratch")
      val afterDrop = s.sql("SHOW TABLES IN merkon_sql").count()
      val scratchExists = s.sql("SHOW TABLES IN merkon_sql LIKE 'scratch'").count() > 0
      val docsExists = s.sql("SHOW TABLES IN merkon_sql LIKE 'docs_slice'").count() > 0
      s.sql("SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars " +
          "FROM merkon_sql.docs_slice GROUP BY lang")
        .select(col("lang"), col("n_docs"), col("sum_chars"),
          lit(afterCreate).as("tables_after_create"),
          lit(afterDrop).as("tables_after_drop"),
          lit(scratchExists).as("scratch_exists"),
          lit(docsExists).as("docs_exists"))
        .orderBy(col("lang"))
    })
  )

  private val l2NormSql =
    "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))"

  override def oracleSql: Map[String, String] = Map(
    // Full-recompute CUBE oracle: the hash match proves the rollup-served
    // marginals equal the fact-scan marginals on every grouping set.
    "store_rollup_rewrite_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total,
        |  true AS rewritten
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // Compaction contract: the six modulo slices cover embeddings
    // exactly once, the appends fragment (>= 6 files), the bin-pack
    // lands one file, and the read-back aggregate is unchanged.
    "store_compact_facade" ->
      """SELECT label, count(*) AS n_keys,
        |  CAST(sum(vec_id) AS BIGINT) AS key_sum,
        |  true AS fragmented_ok, true AS compacted_one_file
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    // DDL contract: 2 tables after the CREATEs, 1 after the DROP, LIKE
    // sees the survivor only; data rows re-derived from documents.
    "store_ddl_sql" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(2 AS BIGINT) AS tables_after_create,
        |  CAST(1 AS BIGINT) AS tables_after_drop,
        |  false AS scratch_exists, true AS docs_exists
        |FROM documents WHERE doc_id % 7 = 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Pure-SQL rollup lifecycle: the served aggregate over the % 3 slice
    // is exact, the procedure-reported state deterministic.
    "store_rollup_procedure_sql" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total,
        |  true AS rewritten, 'full' AS build_kind,
        |  'o_orderstatus' AS dims, 'o_totalprice' AS measures,
        |  true AS cells_ok, true AS guarded
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Full-recompute oracle: the hash match proves incremental == full.
    "store_mv_incremental" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "store_point_get" ->
      """SELECT CAST(vec_id AS VARCHAR) AS key, label
        |FROM embeddings WHERE CAST(vec_id AS VARCHAR) = '42'""".stripMargin,
    "store_batch_get" ->
      s"""SELECT CAST(vec_id AS VARCHAR) AS key, label,
         |  ${QueryPack.round6Sql(l2NormSql)} AS emb_norm
         |FROM embeddings WHERE CAST(vec_id AS VARCHAR) IN ($batchKeysSql)
         |ORDER BY key""".stripMargin,
    "store_remove_batch" ->
      s"""SELECT count(*) AS n_remaining, CAST(sum(label) AS BIGINT) AS label_sum
         |FROM embeddings WHERE CAST(vec_id AS VARCHAR) NOT IN ($batchKeysSql)""".stripMargin,
    "store_upsert_keep_latest" ->
      """WITH unioned AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS key, label, 0 AS _seq FROM embeddings
        |  UNION ALL
        |  SELECT CAST(vec_id AS VARCHAR) AS key, label + 1000 AS label, 1 AS _seq
        |  FROM embeddings WHERE vec_id % 10 = 0
        |), ranked AS (
        |  SELECT key, label, row_number() OVER (PARTITION BY key ORDER BY _seq DESC) AS rn
        |  FROM unioned
        |)
        |SELECT key, label FROM ranked WHERE rn = 1 ORDER BY key""".stripMargin,
    "store_asof_read" ->
      s"""WITH base AS (
         |  SELECT CAST(vec_id AS VARCHAR) AS key, label FROM embeddings
         |), log AS (
         |  SELECT key, label, 0 AS _seq, 'U' AS op FROM base
         |  UNION ALL
         |  SELECT key, label + 1000, 1, 'U' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 1
         |  UNION ALL
         |  SELECT key, NULL, 1, 'D' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 2
         |  UNION ALL
         |  SELECT key, label + 2000, 2, 'U' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 3
         |), vis AS (
         |  SELECT * FROM log WHERE _seq <= 1
         |), latest AS (
         |  SELECT key, max(_seq) AS ms FROM vis GROUP BY key
         |)
         |SELECT v.key, v.label, CAST(v._seq AS BIGINT) AS version
         |FROM vis v JOIN latest m ON v.key = m.key AND v._seq = m.ms
         |WHERE v.op <> 'D'
         |ORDER BY v.key""".stripMargin,
    "store_vacuum" ->
      s"""WITH base AS (
         |  SELECT CAST(vec_id AS VARCHAR) AS key, label FROM embeddings
         |), log AS (
         |  SELECT key, label, 0 AS _seq, 'U' AS op FROM base
         |  UNION ALL
         |  SELECT key, label + 1000, 1, 'U' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 1
         |  UNION ALL
         |  SELECT key, NULL, 1, 'D' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 2
         |  UNION ALL
         |  SELECT key, label + 2000, 2, 'U' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 3
         |), pre AS (
         |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY _seq DESC) AS rn
         |  FROM log WHERE _seq <= 1
         |)
         |SELECT key, label, CAST(_seq AS BIGINT) AS _seq, op
         |FROM pre WHERE rn = 1 AND op <> 'D'
         |UNION ALL
         |SELECT key, label, CAST(_seq AS BIGINT), op
         |FROM log WHERE _seq > 1
         |ORDER BY key, _seq""".stripMargin,
    "store_merge_cdc" ->
      """WITH snap AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS key, label FROM embeddings
        |), del AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS key FROM embeddings WHERE vec_id % 7 = 0
        |), upd AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS key, label + 1000 AS new_label
        |  FROM embeddings WHERE vec_id % 7 = 1
        |), ins AS (
        |  SELECT CAST(vec_id + 100000 AS VARCHAR) AS key, label + 2000 AS label
        |  FROM embeddings WHERE vec_id % 7 = 2
        |), merged AS (
        |  SELECT s.key, coalesce(u.new_label, s.label) AS label
        |  FROM snap s LEFT JOIN upd u ON s.key = u.key
        |  WHERE s.key NOT IN (SELECT key FROM del)
        |  UNION ALL
        |  SELECT key, label FROM ins
        |)
        |SELECT count(*) AS n_items,
        |  CAST(sum(label) AS BIGINT) AS label_sum,
        |  CAST(sum(CASE WHEN label >= 1000 AND label < 2000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_updated,
        |  CAST(sum(CASE WHEN length(key) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted
        |FROM merged""".stripMargin,
    "store_snapshot_diff" ->
      """WITH snap AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS key, label FROM embeddings
        |), del AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS key FROM embeddings WHERE vec_id % 7 = 0
        |), upd AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS key, label + 1000 AS new_label
        |  FROM embeddings WHERE vec_id % 7 = 1
        |), ins AS (
        |  SELECT CAST(vec_id + 100000 AS VARCHAR) AS key, label + 2000 AS label
        |  FROM embeddings WHERE vec_id % 7 = 2
        |), merged AS (
        |  SELECT s.key, coalesce(u.new_label, s.label) AS label
        |  FROM snap s LEFT JOIN upd u ON s.key = u.key
        |  WHERE s.key NOT IN (SELECT key FROM del)
        |  UNION ALL
        |  SELECT key, label FROM ins
        |)
        |SELECT CASE WHEN o.key IS NULL THEN 'insert'
        |            WHEN n.key IS NULL THEN 'delete'
        |            ELSE 'update' END AS op,
        |  coalesce(o.key, n.key) AS key,
        |  o.label AS old_label, n.label AS new_label
        |FROM snap o FULL OUTER JOIN merged n ON o.key = n.key
        |WHERE o.key IS NULL OR n.key IS NULL OR o.label <> n.label
        |ORDER BY op, key""".stripMargin,
    "store_empty_key_purge" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN vec_id % 97 = 0 THEN '' ELSE CAST(vec_id AS VARCHAR) END AS key, label
        |  FROM embeddings
        |)
        |SELECT label, count(*) AS n FROM keyed
        |WHERE length(coalesce(key, '')) > 0 GROUP BY label ORDER BY label""".stripMargin,
    "store_scan_project" ->
      s"""SELECT CAST(vec_id AS VARCHAR) AS key, label,
         |  ${QueryPack.round6Sql(l2NormSql)} AS emb_norm
         |FROM embeddings ORDER BY key""".stripMargin,
    "store_timestamp_codec" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%SZ') AS ts_u,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_roundtrip_epoch
        |FROM events WHERE event_id < 50 ORDER BY event_id""".stripMargin,
    "store_legacy_roundtrip" ->
      s"""SELECT 'k' || lpad(CAST(vec_id AS VARCHAR), 6, '0') AS key,
         |  ${QueryPack.round6Sql(l2NormSql)} AS emb_norm,
         |  '2024-01-02 03:04:05Z' AS ts_u
         |FROM embeddings WHERE vec_id < 300 ORDER BY key""".stripMargin,
    // Oracle reads the parquet table directly: the roundtripped JSONL
    // must aggregate (and content-hash) identically.
    // Final published state = the clean batch only, verdicts predicted.
    "store_write_audit_publish" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total,
        |  true AS batch_a_published, false AS batch_b_published
        |FROM orders
        |WHERE o_orderkey % 10 = 4 AND o_totalprice <= 400000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "store_cdf_read" ->
      s"""WITH base AS (
         |  SELECT CAST(vec_id AS VARCHAR) AS key, label FROM embeddings
         |), log AS (
         |  SELECT key, label, 0 AS _seq, 'U' AS op FROM base
         |  UNION ALL
         |  SELECT key, label + 1000, 1, 'U' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 1
         |  UNION ALL
         |  SELECT key, NULL, 1, 'D' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 2
         |  UNION ALL
         |  SELECT key, label + 2000, 2, 'U' FROM base
         |  WHERE CAST(key AS BIGINT) % 5 = 3
         |), s0 AS (
         |  SELECT key, label AS l0 FROM (
         |    SELECT key, label, op,
         |      row_number() OVER (PARTITION BY key ORDER BY _seq DESC) AS rn
         |    FROM log WHERE _seq <= 0) WHERE rn = 1 AND op <> 'D'
         |), s2 AS (
         |  SELECT key, label AS l2 FROM (
         |    SELECT key, label, op,
         |      row_number() OVER (PARTITION BY key ORDER BY _seq DESC) AS rn
         |    FROM log WHERE _seq <= 2) WHERE rn = 1 AND op <> 'D'
         |), j AS (
         |  SELECT coalesce(s0.key, s2.key) AS key, l0, l2,
         |    s0.key IS NULL AS no0, s2.key IS NULL AS no2
         |  FROM s0 FULL OUTER JOIN s2 ON s0.key = s2.key
         |)
         |SELECT key, 'insert' AS _change_type, l2 AS label FROM j WHERE no0
         |UNION ALL
         |SELECT key, 'delete', l0 FROM j WHERE no2 AND NOT no0
         |UNION ALL
         |SELECT key, 'update_preimage', l0 FROM j
         |WHERE NOT no0 AND NOT no2 AND l0 <> l2
         |UNION ALL
         |SELECT key, 'update_postimage', l2 FROM j
         |WHERE NOT no0 AND NOT no2 AND l0 <> l2
         |ORDER BY key, _change_type""".stripMargin,
    // Plain fact-side aggregation — equality proves the rollup rewrite
    // is exact, not approximate.
    "store_rollup_rewrite" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total,
        |  true AS rewritten
        |FROM orders WHERE o_orderpriority <> '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // double arithmetic over exactly-equal operands (the VARCHAR-parsed
    // exact decimal sum, raw doubles, counts) is correctly rounded and
    // identical on both engines — no integer trickery needed here
    "store_rollup_rewrite_expr" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE)
        |    / count(*) AS avg_unit,
        |  count(*) * 2 AS n2,
        |  max(o_totalprice) - min(o_totalprice) AS price_range,
        |  true AS rewritten
        |FROM orders WHERE o_orderpriority <> '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // avg is reproduced with INTEGER arithmetic at scale 7 half-up
    // (q = round_half_up(sum * 10^4 / n) in 0.0000001 units; positive
    // measure, so floor((2a+n)/(2n)) IS half-up), then parsed
    // VARCHAR -> DOUBLE — DuckDB's native decimal division and direct
    // DECIMAL -> DOUBLE casts are both floating-point and can drift an
    // ulp off Spark's exact DECIMAL(22,7) path.
    "store_rollup_rewrite_minmax" ->
      """WITH g AS (
        |  SELECT o_orderstatus,
        |    min(o_totalprice) AS min_price,
        |    max(o_totalprice) AS max_price,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) * 1000 AS BIGINT) AS s3,
        |    count(*) AS n
        |  FROM orders WHERE o_orderpriority <> '1-URGENT'
        |  GROUP BY o_orderstatus
        |)
        |SELECT o_orderstatus, min_price, max_price,
        |  CAST(printf('%d.%07d', (2*s3*10000 + n) // (2*n) // 10000000,
        |              (2*s3*10000 + n) // (2*n) % 10000000) AS DOUBLE) AS avg_price,
        |  true AS rewritten
        |FROM g ORDER BY o_orderstatus""".stripMargin,
    // two aggregates, one per registered shape — the hash proves both
    // shape-served results exact
    "store_rollup_rewrite_multi" ->
      """SELECT q, key, n, total, true AS rewritten, true AS narrow_served
        |FROM (
        |  SELECT 'by_status' AS q, o_orderstatus AS key, count(*) AS n,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'by_priority' AS q, o_orderpriority AS key, count(*) AS n,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_orderpriority
        |)
        |ORDER BY q, key""".stripMargin,
    // full-fact aggregate over BOTH halves: equality proves the
    // delta-merged cells are value-identical to a from-scratch build
    "store_rollup_refresh_incremental" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  true AS rewritten, true AS incremental
        |FROM orders
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "store_partition_overwrite" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS event_date, value FROM events
        |), md AS (SELECT min(event_date) AS m FROM d)
        |SELECT CAST(event_date AS TIMESTAMP) AS event_day, count(*) AS n,
        |  CAST(CAST(sum(CAST(CASE WHEN event_date = (SELECT m FROM md)
        |    THEN value * 2 ELSE value END AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total_value,
        |  event_date = (SELECT m FROM md) AS revised
        |FROM d GROUP BY event_date ORDER BY event_day""".stripMargin,
    "source_json_corrupt_quarantine" ->
      """SELECT doc_id AS gen_id,
        |  CASE WHEN doc_id % 11 = 0 THEN NULL ELSE doc_id END AS doc_id,
        |  CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
        |  CASE WHEN doc_id % 11 = 0 THEN NULL ELSE n_chars END AS n_chars,
        |  doc_id % 11 <> 0 AS ok
        |FROM documents ORDER BY gen_id""".stripMargin,
    // From-scratch recompute: the hash match proves the incremental
    // four-term refresh (incl. the ΔA⋈ΔB cross term) == full join.
    "store_mv_join_incremental" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "store_constraint_audit" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH a AS (
         |  SELECT count(*) AS n_rows,
         |    CAST(sum(CASE WHEN NOT coalesce(o_totalprice <= 400000, false)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_max,
         |    CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F'), false)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS status_domain,
         |    CAST(sum(CASE WHEN NOT coalesce(
         |        o_orderdate < TIMESTAMP '2001-01-01', false)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS date_horizon,
         |    CAST(sum(CASE WHEN o_custkey IS NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS custkey_not_null,
         |    CAST(sum(CASE WHEN NOT coalesce(o_totalprice <= 400000, false)
         |        OR NOT coalesce(o_orderstatus IN ('O','F'), false)
         |        OR NOT coalesce(o_orderdate < TIMESTAMP '2001-01-01', false)
         |        OR o_custkey IS NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS quarantined
         |  FROM orders
         |)
         |SELECT rule, n_violations, n_rows,
         |  ${r6("n_violations / n_rows")} AS violation_rate
         |FROM (
         |  SELECT '_any_rule' AS rule, quarantined AS n_violations, n_rows FROM a
         |  UNION ALL SELECT 'custkey_not_null', custkey_not_null, n_rows FROM a
         |  UNION ALL SELECT 'date_horizon', date_horizon, n_rows FROM a
         |  UNION ALL SELECT 'status_domain', status_domain, n_rows FROM a
         |  UNION ALL SELECT 'totalprice_max', totalprice_max, n_rows FROM a
         |) ORDER BY rule""".stripMargin
    },
    "source_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS text_hash
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // same parquet-direct oracle, with the CSV-hostile variant applied
    // to every 7th doc exactly as the Spark side does before its write
    "source_csv_roundtrip" ->
      """WITH v AS (
        |  SELECT lang, n_chars, doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ', he said "ok"'
        |         ELSE text END AS text
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS text_hash
        |FROM v GROUP BY lang ORDER BY lang""".stripMargin,
    "source_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS text_hash
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "source_schema_evolution" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_with_text,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
