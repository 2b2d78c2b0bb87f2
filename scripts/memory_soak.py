#!/usr/bin/env python3
"""Memory-pressure soak: run the FULL 138-query inventory at sf1 (10x
bench scale) inside a deliberately small JVM and prove the engine
degrades by SPILLING, not by dying — and that the spilled run produces
BIT-IDENTICAL results to the unconstrained one.

SCALING.md claims every operator's aggregation state is bounded and its
shuffles spill-safe; the scale soaks measure TIME growth but run in the
default 8 GiB heap, so an operator that quietly needs corpus-sized
execution memory would pass them on this box and OOM on a real, memory-
constrained executor. This gate runs a heap LADDER (2g, then 3g, 4g
until one passes) at local[32] — at 2g Spark's unified memory is ~1 GiB
across 32 concurrent task slots against tables 10x bench scale — and
records, per attempt:

  - whether the JVM survived (an OOM/GC-thrash attempt is recorded as
    failed, with the tail of its stderr),
  - wall seconds,
  - Verify's metrics.json: bytes spilled to memory/disk and the peak
    per-task execution memory (the number that must stay bounded as
    data grows — bounded-state evidence).

Then an 8 GiB reference Verify runs on the same corpus and every
query's output is compared BIT-IDENTICALLY (columns name-sorted, rows
sorted — the driver-harness compare) against the constrained run's: a
spill path that corrupts, drops or reorders-with-semantics rows fails
here. Value correctness of the unconstrained path itself is the
standing gates' job (DuckDB parity at sf0.001/0.01/0.1 and twelve
corpora; running the quadratic DuckDB oracle mirrors at sf1 costs CPU-
hours and proves nothing new about MEMORY).

Usage: python3 scripts/memory_soak.py [sf_dir]  (default target/sf1;
       generate it first via scripts/full_soak.py if absent)
Artifact: MEMSOAK.json
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle as co  # norm / row_key — the driver-harness compare

REPO = "/root/repo"
SF = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/target/sf1"
LADDER = ["2g", "3g", "4g"]
REF_HEAP = "8g"
ATTEMPT_TIMEOUT_SEC = 2400


def verify(heap, outdir):
    env = dict(os.environ, SPARK_DRIVER_MEM=heap, SPARK_GRAFT_CPUS="32")
    t0 = time.time()
    try:
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {SF} {outdir}"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=ATTEMPT_TIMEOUT_SEC)
        rc, tail = r.returncode, (r.stdout[-1500:] + r.stderr[-1500:])
    except subprocess.TimeoutExpired as e:
        rc, tail = -9, f"TIMEOUT after {ATTEMPT_TIMEOUT_SEC}s: " + str(
            (e.stdout or b"")[-800:])
    wall = round(time.time() - t0, 1)
    # a query-level failure (errors.json non-empty) is a FAIL even if the
    # JVM exits 0 — Verify catches per-query Throwables incl. OOMs
    errs = {}
    try:
        errs = json.load(open(f"{outdir}/errors.json"))
    except Exception:
        pass
    metrics = None
    try:
        metrics = json.load(open(f"{outdir}/metrics.json"))
        pq_map = metrics.pop("per_query", {})
        metrics["top_spill"] = dict(sorted(
            ((k, v["spill"]) for k, v in pq_map.items()),
            key=lambda kv: -kv[1])[:5])
        metrics["top_peak_task_mem"] = dict(sorted(
            ((k, v["peak_task_mem"]) for k, v in pq_map.items()),
            key=lambda kv: -kv[1])[:5])
    except Exception:
        pass
    ok = rc == 0 and not errs and metrics is not None
    att = {"heap": heap, "survived": ok, "wall_sec": wall,
           "query_errors": list(errs)[:10], "metrics": metrics}
    if not ok:
        att["tail"] = tail[-800:]
    return att


def sorted_rows(outdir, name):
    tbl = pq.read_table(f"{outdir}/{name}", coerce_int96_timestamp_unit="us")
    cols = sorted(tbl.column_names)
    rows = [tuple(co.norm(row[c]) for c in cols) for row in tbl.to_pylist()]
    return cols, sorted(rows, key=co.row_key)


def main():
    if not os.path.isdir(f"{SF}/embeddings.parquet") and \
       not os.path.exists(f"{SF}/embeddings.parquet"):
        sys.exit(f"[memsoak] corpus missing at {SF} — run full_soak.py first")
    attempts = []
    green = None
    for heap in LADDER:
        out = tempfile.mkdtemp(prefix=f"graft-memsoak-{heap}-")
        print(f"[memsoak] Verify at {heap} ...", flush=True)
        att = verify(heap, out)
        attempts.append(att)
        print(f"[memsoak] {heap}: survived={att['survived']} "
              f"wall={att['wall_sec']}s metrics={att['metrics']}", flush=True)
        if att["survived"]:
            green = (heap, out)
            break
    print(f"[memsoak] reference Verify at {REF_HEAP} ...", flush=True)
    ref_out = tempfile.mkdtemp(prefix="graft-memsoak-ref-")
    ref = verify(REF_HEAP, ref_out)
    print(f"[memsoak] {REF_HEAP}: survived={ref['survived']} "
          f"wall={ref['wall_sec']}s metrics={ref['metrics']}", flush=True)

    # bit-identity of the constrained run vs the unconstrained reference
    n_same = 0
    divergent = []
    if green and ref["survived"]:
        _, out = green
        names = sorted(d for d in os.listdir(ref_out)
                       if os.path.isdir(f"{ref_out}/{d}"))
        for name in names:
            try:
                bc, br = sorted_rows(ref_out, name)
                lc, lr = sorted_rows(out, name)
                if bc != lc or br != lr:
                    divergent.append(name)
                else:
                    n_same += 1
            except Exception as e:
                divergent.append(f"{name} (EXC {type(e).__name__})")
        for d in divergent:
            print(f"[MEMSOAK-DIVERGENT] {d}")

    summary = {
        "sf_dir": SF,
        "attempts": attempts,
        "reference": ref,
        "min_green_heap": green[0] if green else None,
        "n_identical_to_reference": n_same,
        "n_divergent": len(divergent),
        "divergent": divergent[:10],
        "wall_ratio_vs_8g": (round(attempts[-1]["wall_sec"] /
                                   ref["wall_sec"], 3)
                             if green and ref["survived"] else None),
        "ok": bool(green) and ref["survived"] and not divergent and
              n_same > 0,
    }
    with open(f"{REPO}/MEMSOAK.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[memsoak] -> MEMSOAK.json (min green heap: "
          f"{summary['min_green_heap']}, {n_same} bit-identical, "
          f"{len(divergent)} divergent, ok={summary['ok']})")
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
