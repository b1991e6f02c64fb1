#!/usr/bin/env python3
"""Mechanical canary adjudication over the committed BENCH_FULL.json history.

Regenerates the BASELINE.md "Canary adjudication" table with zero manual
arithmetic. For every driver round (and optionally the working-tree
BENCH_FULL.json as the in-flight round), prints:

  round | total s | nq | canary min | canary ratio | artifact-read set | fast-floor total

where
  * canary         = q37b_clf_parse_volume warm-min (code unchanged since
                     round 5; fixed 1.57M-line corpus, sf-independent), the
                     pure scan+parse+sort workload most sensitive to
                     co-tenant I/O/CPU contention;
  * canary ratio   = canary / 0.789 (the historical fast anchor the judge
                     adjudicates against);
  * artifact reads = q29c/q61/q62/q63 warm-mins, the persisted-artifact
                     consumers that stay flat when slowness is the rig and
                     not the code;
  * fast-floor     = sum over the run's queries of each query's BEST
                     warm-min across the entire committed history (the
                     code-attributable cost of this query set at a fast
                     rig — what the run "would have read" without the
                     contention window).

Adjudication rule (also in BASELINE.md): a slow total is rig-attributed,
not a regression, iff canary ratio > 5 AND the artifact-read set is within
2x of its own floor AND the slow queries are all-reps-slow in "reps".
Usage: python3 tools/canary_table.py [--with-worktree]
"""
import json
import subprocess
import sys

ANCHOR = 0.789
CANARY = "q37b_clf_parse_volume"
ARTIFACT_READS = ["q29c_minhash_lsh_portable", "q61_dup_clusters",
                  "q62_range_clustered", "q63_zorder_slice"]


def sh(*args):
    return subprocess.run(args, capture_output=True, text=True, check=True).stdout


def bench_at(commit):
    try:
        raw = sh("git", "show", f"{commit}:BENCH_FULL.json")
        return json.loads(raw)
    except Exception:
        return None


def main():
    log = sh("git", "log", "--format=%h\t%s", "--", "BENCH_FULL.json")
    commits = [l.split("\t", 1) for l in log.strip().splitlines() if l]
    # every committed snapshot feeds the per-query fast floor
    snapshots = []
    for h, subj in commits:
        d = bench_at(h)
        if d and "queries" in d:
            snapshots.append((h, subj, d))
    if "--with-worktree" in sys.argv:
        try:
            with open("BENCH_FULL.json") as f:
                d = json.load(f)
            if d.get("queries"):
                # drop a committed twin so the same run isn't counted twice
                snapshots = [x for x in snapshots if x[2]["queries"] != d["queries"]]
                snapshots.insert(0, ("worktree", "in-flight round", d))
        except Exception:
            pass
    floor = {}
    for _, _, d in snapshots:
        for q, v in d["queries"].items():
            floor[q] = min(floor.get(q, float("inf")), v)

    rows = []
    for h, subj, d in snapshots:
        # table rows: driver rounds + the in-flight worktree snapshot
        is_round = subj.startswith("round ") and "verdict" in subj
        if not (is_round or h == "worktree"):
            continue
        label = subj.split(":")[0] if is_round else "r9 (worktree)"
        q = d["queries"]
        canary = q.get(CANARY)
        if canary is None:
            continue
        arts = "/".join(f"{q[a]:.2f}" if a in q else "-" for a in ARTIFACT_READS)
        fast_floor = sum(floor[k] for k in q)
        rows.append((label, d["value"], len(q), canary, canary / ANCHOR,
                     arts, fast_floor))
    rows.reverse()
    print(f"| run | total s | nq | canary s | ratio (/{ANCHOR}) | "
          f"artifact reads q29c/q61/q62/q63 s | fast-floor total s |")
    print("|---|---|---|---|---|---|---|")
    for label, total, nq, canary, ratio, arts, ff in rows:
        print(f"| {label} | {total:.2f} | {nq} | {canary:.2f} | "
              f"{ratio:.1f}x | {arts} | {ff:.1f} |")


if __name__ == "__main__":
    main()
