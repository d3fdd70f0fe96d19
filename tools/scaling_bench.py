"""Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8 N→4N).

No real cluster exists in this sandbox, so per BASELINE.md the same job runs
at two parallelism levels — local[8] vs local[32] — on the SAME
pre-materialized input, in fresh JVMs (subprocesses), and we report
throughput at both plus scaling efficiency = (T8 / T32) / 4.

Writes BENCH/SCALING_RUN.md (BASELINE.md is hand-curated and references
it). Usage: python tools/scaling_bench.py [n_images] [base_parallelism]

base_parallelism picks the N leg (4N = 4x it). Default 4 → local[4] vs
local[16]; pass 2 for the local[2] vs local[8] proxy where BOTH legs keep
core headroom (at local[16] the Arrow stage books all 32 OS threads — 2
per task — so the 4N leg competes with the JVM's own service threads and
any co-tenant load, which understates true multi-node scaling).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import date

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
BASE = int(sys.argv[2]) if len(sys.argv) > 2 else 4

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); n = int(sys.argv[2])
import bench
from ndto_spark.images import validate_images
spark = bench.get_spark(cpus)
path = bench.materialize_images(spark, n, 32)
# warmup on a small slice: spins up JVM codegen + Python workers without
# paying a full pass
validate_images(spark.read.parquet(path).limit(4000), seed=42).violations.count()
best = None
for _ in range(2):
    sec, rows, viols = bench.bench_images_validation(spark, path)
    best = sec if best is None else min(best, sec)

# second datapoint: metadata-rules-only job (pure Catalyst, zero Python) —
# isolates the JVM expression path's scaling from Arrow-UDF worker
# contention. ONE plan over a 20x-replicated read: running 20 separate
# passes measures the single-threaded driver-side Catalyst planning
# (~1.5 s per pass for the compiled rule tree), which anti-scales with
# thread count and says nothing about execution. 32m splits give ~30k-row
# tasks (the 4m Arrow-stage sizing would make scheduling dominate here).
from ndto_spark.runner import validate
from ndto_spark.images import IMAGE_METADATA_RULES
spark.conf.set("spark.sql.files.maxPartitionBytes", "32m")
df20 = spark.read.parquet(*([path] * 20))
v = validate(df20, IMAGE_METADATA_RULES, key="image_id").violations
v.count()  # warm: plan + JIT + page cache
meta_best = None
for _ in range(3):
    t0 = time.time()
    v.count()
    d = time.time() - t0
    meta_best = d if meta_best is None else min(meta_best, d)
# third datapoint: Arrow batch stage ALONE (decode + dim/format + PSNR +
# caption checks, image_batch_violations) — the dominant workload at
# 10^12 rows, isolated from the metadata/uniqueness stages
from ndto_spark.batch import image_batch_violations
bv = image_batch_violations(spark.read.parquet(path), seed=42)
bv.count()  # warm (python worker fleet reused from the pipeline runs)
arrow_best = None
for _ in range(2):
    t0 = time.time()
    bv.count()
    d = time.time() - t0
    arrow_best = d if arrow_best is None else min(arrow_best, d)
# fourth datapoint: the SHUFFLE-HEAVY path — MinHash+LSH dedup (signature
# aggregation, band-bucket self-join, candidate-bounded exact verify) over
# the deterministic planted-near-dup corpus (fixtures.synth_documents).
# The three datapoints above are projection/Arrow-dominated; this one
# scales the join/aggregate machinery the dedup operators live on.
from ndto_spark import fixtures
from ndto_spark.dedup import minhash_lsh_pairs
n_docs = int(os.environ.get("NDTO_SCALING_DOCS", "30000"))
dd = fixtures.synth_documents_cached(spark, n_docs)
spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
pairs = minhash_lsh_pairs(dd, "doc_id", "text")
n_pairs = pairs.count()  # warm: full pass (codegen + shuffle files)
dedup_best = None
for _ in range(2):
    t0 = time.time()
    pairs.count()
    d = time.time() - t0
    dedup_best = d if dedup_best is None else min(dedup_best, d)
# fourth-b datapoint: the signature-only MinHash ESTIMATE path (round-5
# minhash_estimate_pairs) over the SAME planted corpus — the verify-free
# 100 TB variant: identical signature + band-join stages, but scoring is
# a component-agreement fold over two 32-long arrays per candidate
# instead of the exact shingle-Jaccard re-join. Contrast with dedup_sec
# isolates what the exact-verify inverted-index join costs at each size.
from ndto_spark.dedup import minhash_estimate_pairs
est = minhash_estimate_pairs(dd, "doc_id", "text", est_threshold=0.4)
n_est_pairs = est.count()  # warm
est_best = None
for _ in range(2):
    t0 = time.time()
    est.count()
    d = time.time() - t0
    est_best = d if est_best is None else min(est_best, d)
# fifth datapoint: phash band-LSH near-dup (the round-5 operator) over a
# synthesized (id, phash60) population — md5-low60 phashes with a planted
# hamming-1 neighbor every 50th row, exactly the gate query's shape but at
# scaling volume. Pure JVM: md5 + band explode + self-join + popcount
# verify — scales the band-bucket join machinery with zero Python.
# Sizing: 60-bit/4-band keys are 15 bits wide (32k buckets), so bucket
# occupancy df ~ n/32768 and candidate volume ~ 4 * n * df / 2 grows
# QUADRATICALLY with n. 500k rows -> df ~15, ~15M candidates (~5 s on
# local[8]); 4M rows -> df ~122, ~1B candidates (minutes). Keep n well
# under the cap*32768 = 4.2M quadratic wall.
from pyspark.sql import functions as F
from ndto_spark.dedup import phash_near_dups
n_ph = int(os.environ.get("NDTO_SCALING_PHASH", "500000"))
src = F.when(F.col("id") % 50 == 0, F.col("id") - 1).otherwise(F.col("id"))
ph = F.conv(F.substring(F.md5(src.cast("string")), 1, 15), 16, 10).cast("long")
ph = F.when(F.col("id") % 50 == 0, ph.bitwiseXOR(F.lit(8))).otherwise(ph)
imgs_ph = spark.range(0, n_ph, 1, cpus * 4).select(
    F.col("id").alias("img_id"), ph.alias("phash60"))
ph_pairs = phash_near_dups(imgs_ph, "img_id", "phash60", bits=60, bands=4,
                           max_hamming=2, max_band_df=128)
n_ph_pairs = ph_pairs.count()  # warm: codegen + shuffle files
phash_best = None
for _ in range(2):
    t0 = time.time()
    ph_pairs.count()
    d = time.time() - t0
    phash_best = d if phash_best is None else min(phash_best, d)
# sixth datapoint: the WINDOW-FUNCTION path — as-of join (round-5 temporal
# family: union + one running last(ignorenulls) window per key, a single
# Exchange, zero join fan-out). Synthesized deterministic (key, ts) event
# stream: n left rows + n/5 right rows over 10k keys — enough keys that the
# window stage parallelizes, big enough partitions that sort cost shows.
# MEASUREMENT TRAPS (both hit and fixed): (a) a bare count() references no
# payload column, so Catalyst prunes the window AND the whole right-side
# union branch — the leg then times a row count of spark.range; (b) the
# timed reps must rebuild the DataFrame from scratch, or materialized
# shuffle map outputs from the warm pass get reused and only the final
# stage re-runs. Hence: fresh frame per rep, evaluated through an
# aggregate over the matched payload + matched-ts columns.
#
# SCALE TUNING (measured on this box, 40M-row leg): two defaults gut the
# window stage and were masquerading as "windows don't scale":
# - AQE's 64 MB advisoryPartitionSizeInBytes coalesces the narrow-row
#   (~40 B) shuffle into multi-million-row sort partitions — 2.2x slower
#   than ~750k-row partitions (29 s vs 11 s at local[8]). 8m advisory +
#   shuffle.partitions scaled with cluster size keeps sorts cache-sized.
# - windowExec.buffer.in.memory.threshold=4096 pushes every key group
#   larger than 4096 rows (here ~4.8k) into an UnsafeExternalSorter
#   allocation per group; raising it to 1M buffers groups in-memory
#   (~10% on this leg, more at wider payloads).
# With both set, interleaved min-of-3 measured 29.55 s @local[2] vs
# 8.16 s @local[8] = 0.91 efficiency; the bare-sort control (no window)
# reads 0.85, so the window path scales as well as the sort machinery it
# sits on.
from ndto_spark.temporal import asof_join
n_asof = int(os.environ.get("NDTO_SCALING_ASOF", "40000000"))
spark.conf.set("spark.sql.shuffle.partitions", str(cpus * 8))
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")

def _asof_probe():
    lhs = spark.range(0, n_asof, 1, cpus * 4).select(
        F.col("id").alias("ev_id"),
        (F.col("id") % 10000).alias("k"),
        F.timestamp_micros((F.col("id") * 48271) % 86400000000).alias("ts"))
    rhs = spark.range(0, n_asof // 5, 1, cpus * 4).select(
        (F.col("id") % 10000).alias("k"),
        F.timestamp_micros((F.col("id") * 69621) % 86400000000).alias("ts"),
        (F.col("id") * 7).alias("payload"))
    aj = asof_join(lhs, rhs, on="ts", by="k", tolerance_s=7200)
    row = aj.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("asof_ts_us").alias("matched"),
        F.sum("payload").alias("s"),
    ).collect()[0]
    return row["n"], row["matched"]

n_asof_rows, n_asof_matched = _asof_probe()  # warm: codegen + JIT
asof_best = None
for _ in range(2):
    t0 = time.time()
    _asof_probe()
    d = time.time() - t0
    asof_best = d if asof_best is None else min(asof_best, d)
# seventh datapoint: the ITERATIVE path — integer-quantized PageRank
# (graph.pagerank, round-5): per iteration one equi-join on src + one
# partial-agg groupBy(dst) + a left join back onto the persisted vertex
# set; 3 rounds over a synthesized multigraph. Each rep re-runs the FULL
# operator (its internal persists are fresh per call and the superseded
# round is unpersisted), so cached round frames can't fake the timing —
# this leg scales the join/aggregate machinery under iteration, where
# fixed per-job scheduling costs bite hardest.
from ndto_spark.graph import pagerank
# host-level link-graph density (~800 out-links/host): map-side partial
# aggregation collapses the per-round contribution shuffle to <= |V| rows
# per task, so iterations are CPU-bound and scale (measured 0.92 marginal
# per-iteration, 0.83 full operator at this size). At page-graph sparsity
# (degree ~40) the per-round shuffle is bandwidth-bound and the single-box
# proxy floors near 0.6 — all threads share one disk/DRAM; real clusters
# add I/O channels with nodes. The vertex table is passed in (the 100 TB
# calling convention — deriving it costs a full distinct over the edges).
# clearCache per rep: pagerank persists its result, and identical rep
# plans would otherwise silently alias the previous rep's cache.
n_pr_edges = int(os.environ.get("NDTO_SCALING_PR_EDGES", "80000000"))
n_pr_verts = 100000
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
pr_vt = spark.range(0, n_pr_verts, 1, cpus * 4).select(
    F.col("id").alias("vertex"))
def _pr_probe():
    spark.catalog.clearCache()
    e = spark.range(0, n_pr_edges, 1, cpus * 4).select(
        (F.col("id") % n_pr_verts).alias("src"),
        ((F.col("id") * 48271 + 11) % n_pr_verts).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    out = pagerank(e, n_iter=5, vertices=pr_vt)
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("rank_scaled").alias("mass")).collect()[0]
    return row["n"], row["mass"]
n_pr_v, pr_mass = _pr_probe()  # warm: codegen + JIT + shuffle files
pr_best = None
for _ in range(2):
    t0 = time.time()
    _pr_probe()
    d = time.time() - t0
    pr_best = d if pr_best is None else min(pr_best, d)
print(json.dumps({"cpus": cpus, "sec": best, "rows": rows, "viols": viols,
                  "meta_sec": meta_best, "meta_rows": rows * 20,
                  "arrow_sec": arrow_best,
                  "dedup_sec": dedup_best, "dedup_rows": n_docs,
                  "dedup_pairs": n_pairs,
                  "est_sec": est_best, "est_pairs": n_est_pairs,
                  "phash_sec": phash_best, "phash_rows": n_ph,
                  "phash_pairs": n_ph_pairs,
                  "asof_sec": asof_best, "asof_rows": n_asof,
                  "asof_matched": n_asof_matched,
                  "pr_sec": pr_best, "pr_edges": n_pr_edges,
                  "pr_verts": n_pr_v, "pr_mass": pr_mass}))
"""


def run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(N)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # Arrow-UDF tasks each occupy TWO threads (a JVM task thread + a Python
    # worker), so on this 32-core box local[32] runs ~64 runnable threads and
    # oversubscription masks scaling (measured: local[32] slower than
    # local[8]). N=4 vs 4N=16 keeps both sizes within the core budget
    # (2*16 = 32) — the faithful analog of N vs 4N executor COUNTS, where
    # each executor brings its own cores.
    #
    # The box is SHARED and co-tenant bursts last minutes (observed the same
    # leg at 74s and 18s ten minutes apart). Alternate the legs and take the
    # per-leg min across rounds so each leg gets samples in more than one
    # interference window — a back-to-back pair silently attributes a
    # co-tenant burst to whichever leg it overlapped.
    def _min_leg(a: dict, b: dict) -> dict:
        out = dict(a)
        out["sec"] = min(a["sec"], b["sec"])
        out["meta_sec"] = min(a["meta_sec"], b["meta_sec"])
        out["arrow_sec"] = min(a["arrow_sec"], b["arrow_sec"])
        out["dedup_sec"] = min(a["dedup_sec"], b["dedup_sec"])
        out["est_sec"] = min(a["est_sec"], b["est_sec"])
        out["phash_sec"] = min(a["phash_sec"], b["phash_sec"])
        out["asof_sec"] = min(a["asof_sec"], b["asof_sec"])
        out["pr_sec"] = min(a["pr_sec"], b["pr_sec"])
        return out

    r8 = run(BASE)
    r32 = run(4 * BASE)
    for _ in range(2):
        r8 = _min_leg(r8, run(BASE))
        r32 = _min_leg(r32, run(4 * BASE))
    tp8 = r8["rows"] / r8["sec"]
    tp32 = r32["rows"] / r32["sec"]
    eff = (tp32 / tp8) / 4.0
    mtp8 = r8["meta_rows"] / r8["meta_sec"]
    mtp32 = r32["meta_rows"] / r32["meta_sec"]
    meff = (mtp32 / mtp8) / 4.0
    atp8 = r8["rows"] / r8["arrow_sec"]
    atp32 = r32["rows"] / r32["arrow_sec"]
    aeff = (atp32 / atp8) / 4.0
    dtp8 = r8["dedup_rows"] / r8["dedup_sec"]
    dtp32 = r32["dedup_rows"] / r32["dedup_sec"]
    deff = (dtp32 / dtp8) / 4.0
    etp8 = r8["dedup_rows"] / r8["est_sec"]
    etp32 = r32["dedup_rows"] / r32["est_sec"]
    eeff = (etp32 / etp8) / 4.0
    ptp8 = r8["phash_rows"] / r8["phash_sec"]
    ptp32 = r32["phash_rows"] / r32["phash_sec"]
    peff = (ptp32 / ptp8) / 4.0
    jtp8 = r8["asof_rows"] / r8["asof_sec"]
    jtp32 = r32["asof_rows"] / r32["asof_sec"]
    jeff = (jtp32 / jtp8) / 4.0
    gtp8 = r8["pr_edges"] / r8["pr_sec"]
    gtp32 = r32["pr_edges"] / r32["pr_sec"]
    geff = (gtp32 / gtp8) / 4.0
    md = f"""# Raw scaling run, base parallelism {BASE} (see BASELINE.md for curated evidence)

Date: {date.today()}  ·  job: full images validation pipeline (metadata
rules + Arrow batch decode/dim/format/PSNR/caption checks + uniqueness)
over the deterministic images table ({r8['rows']:,} rows, pre-materialized
parquet, identical input for both sizes), fresh JVM per size, best of 2
timed runs after warmup (shared box — min is the least-interfered run).

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['sec']:.2f} | {tp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['sec']:.2f} | {tp32:,.0f} |

**Full-pipeline scaling efficiency N→4N = {eff:.2f}** (target ≥ 0.8).

Metadata-rules-only job (pure Catalyst expressions, zero Python — isolates
the JVM path from single-box JVM↔Python worker contention; 5 passes per
timing — short JVM jobs, so fixed per-job costs dominate this ratio):

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['meta_sec']:.2f} | {mtp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['meta_sec']:.2f} | {mtp32:,.0f} |

**Catalyst-path scaling efficiency N→4N = {meff:.2f}** (target ≥ 0.8).

Arrow batch stage alone (decode + dim/format + PSNR + caption checks,
image_batch_violations — the dominant workload at 10^12 rows), min-of-2
per round after warm:

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['arrow_sec']:.2f} | {atp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['arrow_sec']:.2f} | {atp32:,.0f} |

**Arrow-stage scaling efficiency N→4N = {aeff:.2f}** (target ≥ 0.8).

MinHash+LSH dedup pipeline (the SHUFFLE-HEAVY path: signature aggregation,
band-bucket self-join, candidate-bounded exact Jaccard verify) over the
{r8['dedup_rows']:,}-doc planted-near-dup corpus (fixtures.synth_documents;
{r8['dedup_pairs']:,} verified pairs, identical at both sizes), min-of-2
after a full warm pass:

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['dedup_sec']:.2f} | {dtp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['dedup_sec']:.2f} | {dtp32:,.0f} |

**Dedup-pipeline scaling efficiency N→4N = {deff:.2f}** (target ≥ 0.8).

MinHash signature-only ESTIMATE path (same corpus and signature/band
stages, verify-free scoring — the 100 TB variant; {r8['est_pairs']:,}
estimated pairs, identical at both sizes), min-of-2 after a full warm
pass:

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['est_sec']:.2f} | {etp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['est_sec']:.2f} | {etp32:,.0f} |

**Estimate-path scaling efficiency N→4N = {eeff:.2f}** (target ≥ 0.8).

Phash band-LSH near-dup (bit-band explode, band-bucket self-join with the
DF cap on, popcount verify — pure JVM join machinery) over a
{r8['phash_rows']:,}-row synthesized (id, phash60) population with a planted
hamming-1 neighbor every 50th row ({r8['phash_pairs']:,} verified pairs,
identical at both sizes), min-of-2 after a full warm pass:

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['phash_sec']:.2f} | {ptp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['phash_sec']:.2f} | {ptp32:,.0f} |

**Phash-banding scaling efficiency N→4N = {peff:.2f}** (target ≥ 0.8).

As-of join (round-5 temporal family — the WINDOW-FUNCTION path: union +
one running last(ignorenulls) window per key, single Exchange, zero join
fan-out) over a synthesized {r8['asof_rows']:,}-row event stream
(+ 1/5 right side, 10k keys, {r8['asof_matched']:,} matched rows —
identical at both sizes). The frame is rebuilt from scratch each rep and
evaluated through an aggregate over the matched payload, so neither
Catalyst's unreferenced-window pruning nor reused shuffle map outputs can
fake the timing. Tuned for the narrow-row window stage (8m AQE advisory
partition size so coalescing can't build multi-million-row sort
partitions; windowExec in-memory buffer raised above the per-key group
size; shuffle partitions scaled with cluster size); min-of-2 after a full
warm pass:

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['asof_sec']:.2f} | {jtp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['asof_sec']:.2f} | {jtp32:,.0f} |

**As-of-join scaling efficiency N→4N = {jeff:.2f}** (target ≥ 0.8).

Integer-quantized PageRank (round-5 ITERATIVE path: per round one
shuffle-hash edges⋈ranks join + partial-agg groupBy(dst) + vertex
left-join; 5 rounds built as ONE linear plan with two driver barriers,
vertex table passed in — the 100 TB calling convention) over a
synthesized {r8['pr_edges']:,}-edge / {r8['pr_verts']:,}-vertex
host-density multigraph (total scaled mass {r8['pr_mass']:,} — identical
at both sizes, bit-exact by construction; cache cleared per rep so reps
cannot alias the previous result), min-of-2 after a full warm pass:

| parallelism | wall sec | edges/sec |
|---|---|---|
| local[{r8['cpus']}]  (N)  | {r8['pr_sec']:.2f} | {gtp8:,.0f} |
| local[{r32['cpus']}] (4N) | {r32['pr_sec']:.2f} | {gtp32:,.0f} |

**PageRank-iteration scaling efficiency N→4N = {geff:.2f}** (target ≥ 0.8).

Violations found: {r8['viols']:,} (identical at both sizes — same input,
deterministic pipeline).

Notes: single machine, so "4N executors" is modeled as 4× executor threads
in one JVM. Each Arrow-UDF task occupies two OS threads (JVM task thread +
Python worker), so both sizes are kept within the 32-core budget
(2 × 16 = 32); sizes beyond that oversubscribe the box and understate true
multi-node scaling, where each executor brings its own cores, memory
channels and disk.
"""
    os.makedirs("BENCH", exist_ok=True)
    out = "BENCH/SCALING_RUN.md" if BASE == 4 else f"BENCH/SCALING_RUN_base{BASE}.md"
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
