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
  * canary ratio   = canary / 1.35 (RE-ANCHORED r15: the old 0.789 was
                     a round-3 number from a 120k-line corpus; round 4
                     grew q37b to 1.57M lines and the anchor never moved.
                     1.35 = best recorded healthy warm min at the current
                     workload — see BASELINE.md r15 adjudication);
  * artifact reads = q29c/q61/q62/q63 warm-mins, the persisted-artifact
                     consumers that stay flat when slowness is the rig and
                     not the code;
  * fast-floor     = sum over the run's queries of each query's BEST
                     warm-min across the entire committed history (the
                     code-attributable cost of this query set at a fast
                     rig — what the run "would have read" without the
                     contention window).

Adjudication rule (also in BASELINE.md): a slow total is rig-attributed,
not a regression, iff (a) canary ratio > 2.9 (the CANARY_DEGRADED bar) AND (b) every artifact read is
within max(2x floor, floor + 0.25 s) of its history floor AND (c) the
slow queries are all-reps-slow in "reps".

The 0.25 s absolute-noise term in (b) is the round-10 amendment: on a
sub-quarter-second artifact read, a single co-tenant page-cache miss is
a >2x swing (the r9 driver run was provably rig-slow — same commit
benched 51.4 s vs 75.7 s — yet q61's 0.244 s vs a 0.120 s floor missed
the pure-ratio clause by 4 ms). A CODE regression in the shared artifact
plumbing moves these reads by whole multiples AND survives the absolute
term, so the amendment trades no detection power.

Clause (c) is implied for the TOTAL (= sum of per-query minima): a
warm-min above the noise threshold means every rep was. It still needs a
manual reps-array read when adjudicating a single query's delta.

The `adjudication` column makes the rule a table read:
  fast-rig        ratio <= 2.9 (rule not invoked; the run speaks for itself)
  rig-attributed  ratio > 2.9 and clause (b) passes
  (b) FAIL qNN    ratio > 2.9 and artifact qNN read outside its noise bound
Usage: python3 tools/canary_table.py [--with-worktree]
"""
import json
import subprocess
import sys

ANCHOR = 1.35  # r15 re-anchor (was 0.789 at the round-3 120k-line workload)
CANARY = "q37b_clf_parse_volume"
ARTIFACT_READS = ["q29c_minhash_lsh_portable", "q61_dup_clusters",
                  "q62_range_clustered", "q63_zorder_slice"]
# clause (a): canary ratio above this = degraded rig window (2.9 at the
# 1.35 anchor = the same ~3.9 s absolute bar the old 5.0x-of-0.789 set)
CANARY_DEGRADED = 2.9
# clause (b): artifact read passes iff <= max(RATIO_BOUND * floor,
# floor + ABS_NOISE_SEC) — the absolute term absorbs single page-cache
# misses on sub-quarter-second reads (round-10 amendment)
RATIO_BOUND = 2.0
ABS_NOISE_SEC = 0.25


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
        label = subj.split(":")[0] if is_round else "worktree (in-flight)"
        q = d["queries"]
        canary = q.get(CANARY)
        if canary is None:
            continue
        arts = "/".join(f"{q[a]:.2f}" if a in q else "-" for a in ARTIFACT_READS)
        fast_floor = sum(floor[k] for k in q)
        b_fails = [a for a in ARTIFACT_READS if a in q and
                   q[a] > max(RATIO_BOUND * floor[a], floor[a] + ABS_NOISE_SEC)]
        if canary / ANCHOR <= CANARY_DEGRADED:
            verdict = "fast-rig"
        elif not b_fails:
            verdict = "rig-attributed"
        else:
            verdict = "(b) FAIL " + ",".join(
                f"{a.split('_')[0]} {q[a]:.2f}/{floor[a]:.2f}" for a in b_fails)
        rows.append((label, d["value"], len(q), canary, canary / ANCHOR,
                     arts, fast_floor, verdict))
    rows.reverse()
    print(f"| run | total s | nq | canary s | ratio (/{ANCHOR}) | "
          f"artifact reads q29c/q61/q62/q63 s | fast-floor total s | adjudication |")
    print("|---|---|---|---|---|---|---|---|")
    for label, total, nq, canary, ratio, arts, ff, verdict in rows:
        print(f"| {label} | {total:.2f} | {nq} | {canary:.2f} | "
              f"{ratio:.1f}x | {arts} | {ff:.1f} | {verdict} |")


if __name__ == "__main__":
    main()
