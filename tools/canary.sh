#!/usr/bin/env bash
# Isolated canary bench (VERDICT r12 ask #3): a fixed ~12-query subset —
# the TPC-H shapes plus one stable query per operator family — each
# benched in its OWN fresh JVM at sf0.1, written to CANARY_r{N}.json at
# round close. Purpose: full-surface totals drift with box state (r12
# measured +3.9% spread near-uniformly across untouched queries); a
# fixed isolated canary separates box drift (all canaries move together)
# from a real plan change (one canary moves alone) in one glance.
#
# Comparison rule (also in SCALE.md): compare per-query ratios between
# rounds; a UNIFORM shift across canaries is box state, a single query
# moving >1.5x while the rest hold is a plan change to investigate.
#
# Usage: sbt -batch compile && tools/canary.sh CANARY_r13.json
set -euo pipefail
OUT=${1:?usage: tools/canary.sh CANARY_rN.json}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-32}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# Spark 4.x on JDK 17 outside spark-submit (same list as build.sbt)
JAVA_OPTS=(
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED
  "-Xmx${SPARK_DRIVER_MEM:-8g}"
)
# one per family: TPC-H aggs/joins, grouping sets (an r12 mover), dedup,
# text, curation, events, search, graph (the r10/r12 noise-saga query —
# its settled cost is the canary's own canary), multimodal, exact kNN;
# r16 adds the two non-canaried r15 in-run movers (q_rollup_pricing 16x,
# embedding_covariance 7x — both normal isolated) so the next spike on
# them adjudicates from the sidecar alone (VERDICT r15 ask #2)
QUERIES=(
  q1_pricing_summary q5_nation_revenue q18_large_orders q_grouping_sets
  dedup_jaccard_topk text_quality_score corpus_ngram_contamination
  events_funnel search_bm25_topk graph_pagerank multimodal_image_ahash
  knn_join q_rollup_pricing embedding_covariance
)
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
for q in "${QUERIES[@]}"; do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_BENCH_OUT="$TMP/$q.json" \
  java "${JAVA_OPTS[@]}" -cp "$CP" graft.Bench >/dev/null 2>&1 \
    || { echo "[canary] $q FAILED" >&2; exit 1; }
  echo "[canary] $q done"
done
python3 - "$OUT" "$TMP" "$SF" "${QUERIES[@]}" <<'EOF'
import json, sys
out, tmp, sf, queries = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]
merged = {}
for q in queries:
    with open(f"{tmp}/{q}.json") as f:
        data = json.load(f)["queries"]
    # SPARK_GRAFT_ONLY matches substrings (knn_join also runs
    # ann_knn_join) — keep only the exact canary name
    merged[q] = data[q]
with open(out, "w") as f:
    json.dump({"sf": sf, "mode": "isolated-fresh-jvm-per-query",
               "queries": merged}, f, indent=1)
print(f"[canary] wrote {out}")
EOF
