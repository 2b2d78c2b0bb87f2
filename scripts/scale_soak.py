#!/usr/bin/env python3
"""sf3/sf10 scale soak of the superlinear-suspect families (VERDICT r9
item 3). The sf1 soak proved the full inventory to 10x bench scale; the
three cliffs it caught (fixed LSH planes, fixed SemDeDup k, per-token
explode) were invisible at sf0.1 — so the families whose cost is
candidate-pair-shaped (LSH/SimHash self-joins, SemDeDup, ANN, connected
components, containment) get pushed further: sf3 (30x sf0.1) and sf10
(100x sf0.1), flagged against the sf1 base with a growth budget equal to
the data ratio (3x / 10x).

These families read only documents + embeddings, so corpora are
generated with GenCorpus's table-subset arg — no multi-GB lineitem
needed. Derived auto-knob parameters (occupancy-rule planes / quantizer
k) are computed per SF from the corpus count with the same integer-exact
bit-length rule the engine and the DuckDB mirrors share, and recorded in
the artifact so the expected step-up is visible.

Usage: python3 scripts/scale_soak.py [--skip-gen] [--skip-sf1]
Artifacts: SOAK_sf3.json, SOAK_sf10.json (committed).
"""
import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = "/root/repo"
SRC = "/root/testdata/sf0.1"
FAMILY = ["q31_", "q41_", "q48_", "q71_", "q82_", "q97_", "q108_",
          "q113_", "q125_", "q128_", "q131_"]
TIERS = {"sf1": 10, "sf3": 30, "sf10": 100}
TABLES = "documents,embeddings"


def run(cmd, env=None, log=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e, capture_output=True, text=True)
    if log:
        open(log, "w").write(r.stdout + "\n--- stderr ---\n" + r.stderr)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
        sys.exit(f"command failed: {' '.join(cmd)}")
    return r.stdout


def gen(tier, reps):
    dest = f"{REPO}/target/{tier}"
    if os.path.exists(f"{dest}/embeddings.parquet"):
        print(f"[soak] {tier}: corpus present, skipping generation")
        return
    print(f"[soak] generating {tier} ({reps}x {SRC}, {TABLES}) ...")
    run(["sbt", "-batch",
         f"runMain graft.tools.GenCorpus {SRC} {dest} {reps} {TABLES}"])


def bench(tier):
    out = f"{REPO}/target/soak_bench_{tier}.json"
    if os.path.exists(out):
        print(f"[soak] {tier}: bench cells present, skipping run")
        return out
    print(f"[soak] benching family at {tier} ...")
    stdout = run(["sbt", "-batch", "runMain graft.Bench"],
                 env={"SPARK_GRAFT_SF_DIR": f"{REPO}/target/{tier}",
                      "SPARK_GRAFT_ONLY": ",".join(FAMILY),
                      "SPARK_GRAFT_REPS": "1",
                      "SPARK_GRAFT_CPUS": "32"},
                 log=f"{REPO}/target/soak_bench_{tier}.log")
    line = [l for l in stdout.splitlines() if l.startswith('{"metric"')][-1]
    open(out, "w").write(line + "\n")
    return out


def occupancy_bits(n, t):
    m = max((n + t - 1) // t - 1, 0)
    return len(bin(m)) - 2 if m > 0 else 1


def derived_knobs(tier):
    n = pq.read_metadata(f"{REPO}/target/{tier}/embeddings.parquet").num_rows
    return {
        "n_embeddings": n,
        "q48_planes": min(max(4, occupancy_bits(n, 128)), 30),
        "q125_planes": min(max(4, occupancy_bits(n, 32)), 30),
        "q82_q97_kcentroids": max(8, 1 << min(occupancy_bits(n, 256), 20)),
    }


def main():
    if "--skip-gen" not in sys.argv:
        for tier, reps in TIERS.items():
            if tier == "sf1" and "--skip-sf1" in sys.argv:
                continue
            gen(tier, reps)
    benches = {t: bench(t) for t in TIERS}
    fail = 0
    for big, budget in (("sf3", 3), ("sf10", 10)):
        out = f"{REPO}/SOAK_{big}.json"
        r = subprocess.run([sys.executable, "scripts/soak_compare.py",
                            benches["sf1"], benches[big], out,
                            f"--budget={budget}", "--floor=0.5"],
                           cwd=REPO, capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        fail |= r.returncode
        # enrich the artifact with the knob step-up log
        d = json.load(open(out))
        d["derived_knobs"] = {t: derived_knobs(t) for t in ("sf1", big)}
        d["family"] = FAMILY
        json.dump(d, open(out, "w"), indent=1)
        print(f"[soak] {out}: knobs {d['derived_knobs'][big]}")
    sys.exit(fail)


if __name__ == "__main__":
    main()
