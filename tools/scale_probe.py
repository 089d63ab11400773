#!/usr/bin/env python3
"""Scale probe: time the expensive query families at sf1 (10x the
bench gate's sf0.1) and flag super-linear growth.

Runs graft.Bench twice over the SPARK_GRAFT_ONLY subset — same JVM
settings, same reps — then writes bench/sf1_probe.json with per-query
warm medians at both SFs, the growth factor, and a flagged list of
queries whose warm time grew super-linearly (growth > FLAG_FACTOR x
the 10x volume ratio, with an absolute floor so fixed-overhead noise
on sub-second queries doesn't flag).

Usage: python3 tools/scale_probe.py [sf1_dir] (default /tmp/graft_sf1;
generate it first with tools/make_sf1.py)
"""
import json
import os
import re
import subprocess
import sys

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
VOLUME_RATIO = 10.0
FLAG_FACTOR = 1.5  # growth beyond 1.5x-per-unit-volume is super-linear
ABS_FLOOR_SEC = 1.5  # ...if the sf1 time also exceeds this

PROBE = [
    # the r11 bench top-15 (by warm median)
    "assoc_rules_pairs", "layout_bucketed_join", "stats_mad_outliers",
    "dedup_cluster_modularity", "ql_create_cq", "ann_binary_recall",
    "cq_downsample", "stats_winsorized", "text_bigram_logprob",
    "ann_pca_topk", "ann_lsh_multiprobe_recall", "mm_phash_neardup",
    "ql_downsample_fill_prev", "pipeline_leakage_safe_split",
    "text_pmi_bigrams",
    # flagship family representatives
    "q1_pricing_summary", "dedup_pipeline", "join_asof",
    "graph_pagerank", "emb_knn_label",
    # the r12 full-registry probe's findings, kept under watch:
    # output-sensitive candidate chains and the re-shaped entries
    "dedup_edit_distance", "dedup_semantic", "dedup_semantic_scaled",
    "decontaminate_embedding", "decontaminate_fuzzy",
    "dedup_simhash_pairs", "stats_corr_matrix",
    # the r13 write plane (verdict r13 item 2 / r12 item 8): the
    # /write upsert path — field-merge windows + the once-cached
    # catalog walk — must stay sub-linear as the stored table grows
    "sync_write_upsert",
    # r15: growing-index maintenance (candidate-chain output-sensitive
    # like dedup_edit_distance) and the /write -> CQ rewind path
    "dedup_inc_sigmatch", "dedup_inc_index_delta", "cq_write_backfill",
    # r15 wave 2: fixed-codebook IVF (assignment is a zero-shuffle
    # projection; the probe join is per-list work, linear in corpus)
    "ann_ivf_inc_assign", "ann_ivf_inc_topk", "dedup_inc_marks_within",
    # r16: the PERSISTED two-tier pruned index paths (seed + compact +
    # bucket-pruned ingest / list-pruned serve, end to end); the
    # store-FLATNESS axis (fixed batch, growing store) is the separate
    # graft.IndexProbe -> bench/index_probe.json artifact
    "dedup_inc_pruned_marks", "ann_ivf_inc_pruned_topk",
    # r17: the persisted PQ/codes face (IVFADC serve over the grown
    # index) — the memory-bound face a 100 TB index actually stores
    "ann_ivfpq_inc_topk",
    # r18: drift repair across a live re-cluster, tombstone-based
    # retention (expiry must stay O(expired), not a store rewrite),
    # index observability, and the cross-doc exact-substring spans
    # (output-sensitive anchor chain like dedup_edit_distance)
    "ann_ivf_recluster_topk", "dedup_inc_expired_marks",
    "ann_ivf_expired_topk", "index_stats", "dedup_cross_spans",
]


def run(sf_dir):
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS="32",
        SPARK_GRAFT_REPS="3",
        SPARK_GRAFT_ONLY=",".join(PROBE),
    )
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        m = re.search(r'\{"metric".*\}', line)
        if m:
            return json.loads(m.group(0))
    sys.exit(f"no bench JSON for {sf_dir}\n{out.stdout[-3000:]}")


r01 = run(SF01)
r1 = run(SF1)

rows = {}
flagged = []
for q in PROBE:
    t0 = r01["queries_warm"].get(q, -1)
    t1 = r1["queries_warm"].get(q, -1)
    growth = round(t1 / t0, 2) if t0 and t0 > 0 and t1 > 0 else None
    rows[q] = {"warm_sf0.1": round(t0, 3), "warm_sf1": round(t1, 3),
               "growth": growth}
    if (growth is not None and growth > FLAG_FACTOR * VOLUME_RATIO
            and t1 > ABS_FLOOR_SEC):
        flagged.append(q)

report = {
    "volume_ratio": VOLUME_RATIO,
    "notes": {
        "dedup_edit_distance":
            "output-sensitive by design: LSH candidate generation work "
            "tracks the true candidate-pair count (256 -> 103k here, "
            "403x — the sf1 splice synthesis carries deliberate "
            "1/3-overlap structure), while per-candidate cost stays "
            "constant (banded levenshtein O(len*K)). Production lever: "
            "more rows per band as corpora densify (collision p = "
            "s^rows per band). See SURVEY round-12 third wave.",
        "decontaminate_fuzzy":
            "same output-sensitive class (r15 measured): the sf1 "
            "splice synthesis grows true LSH candidates 403x, and the "
            "~9x residual is the sign+band+bucket-join CANDIDATE stage "
            "tracking that collision count — r15 moved the cross-split "
            "restriction BEFORE the exact-jaccard confirm (only "
            "train-x-test pairs confirm now), so the confirm no "
            "longer contributes; the candidate stage shares "
            "dedup_edit_distance's rows-per-band production lever."},
    "flag_threshold": f"growth > {FLAG_FACTOR}*{VOLUME_RATIO} and "
                      f"sf1 > {ABS_FLOOR_SEC}s",
    "queries": rows,
    "superlinear": sorted(flagged),
    "failed_sf01": r01.get("failed", []),
    "failed_sf1": r1.get("failed", []),
}
os.makedirs("/root/repo/bench", exist_ok=True)
with open("/root/repo/bench/sf1_probe.json", "w") as f:
    json.dump(report, f, indent=1, sort_keys=True)
print(json.dumps(report, indent=1, sort_keys=True))
