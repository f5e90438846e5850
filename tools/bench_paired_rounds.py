"""Cross-round paired bench: time the headline queries of an OLD git ref and
the CURRENT checkout back-to-back in one contention window.

The round-2→3 comparison was unusable because the two bench runs landed in
different host-contention windows (untouched queries "doubled").  This tool
applies the bench_scaling pairing protocol across code versions instead of
core counts: alternating (old, new) single-run subprocesses, best-of-N per
side, plus the per-query new/old ratio — so a claimed round-over-round delta
is measured against the same neighbors.

Usage:
    python tools/bench_paired_rounds.py <old_ref> [reps] [sf_dir] [cpus]
Defaults: reps=3, sf_dir=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1,
cpus=$SPARK_GRAFT_CPUS or 32.  Prints ONE JSON line.

The old ref is checked out into a throwaway git worktree; both sides share
this repo's data/ caches via REX_SPARK_DATA_DIR (the generated corpora are
version-keyed, so a shared cache is valid iff both sides' GEN_VERSION
agree — asserted below).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kg_triples",
    "kg_links",
    "q_langid",
    "q_quality",
    "q_dedup_exact_groups",
    "q_dedup_minhash",
    "q_embed_topk_ivf",
]


def run_side(repo: str, sf_dir: str, cpus: int, names) -> dict:
    env = dict(os.environ, REX_SPARK_DATA_DIR=os.path.join(REPO, "data"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_pair_runner.py"),
         repo, sf_dir, str(cpus), *names],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    old_ref = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = (
        sys.argv[3] if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    cpus = (
        int(sys.argv[4]) if len(sys.argv) > 4
        else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    wt = f"/tmp/bench_pair_{old_ref.replace('/', '_')}"
    if os.path.exists(wt):
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", wt],
                       capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", wt, old_ref],
        check=True, capture_output=True,
    )
    try:
        # shared data/ caches are only valid across identical GEN_VERSIONs
        def gen_version(repo: str) -> str:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, sys.argv[1]); "
                 "from relationextractionpipeline_spark.sources import testgen; "
                 "print(testgen.GEN_VERSION)", repo],
                capture_output=True, text=True, check=True,
            )
            return out.stdout.strip()

        assert gen_version(wt) == gen_version(REPO), (
            "GEN_VERSION differs between refs — shared data/ caches invalid; "
            "compare in triples/sec instead"
        )
        pairs: dict = {}
        for rep in range(reps):
            for side, repo in (("old", wt), ("new", REPO)):
                res = run_side(repo, sf_dir, cpus, HEADLINE)
                for name, v in res.items():
                    entry = pairs.setdefault(
                        name, {"old": [], "new": [], "rows": {}}
                    )
                    entry[side].append(v["sec"])
                    entry["rows"][side] = v["rows"]
            print(f"# rep {rep} done", file=sys.stderr)
        report = {
            "metric": "bench_paired_rounds",
            "old_ref": old_ref,
            "reps": reps,
            "sf_dir": sf_dir,
            "cpus": cpus,
            "queries": {},
        }
        for name, e in pairs.items():
            best_old, best_new = min(e["old"]), min(e["new"])
            report["queries"][name] = {
                "old_best_sec": best_old,
                "new_best_sec": best_new,
                "ratio_new_over_old": round(best_new / best_old, 3),
                "rows_old": e["rows"]["old"],
                "rows_new": e["rows"]["new"],
                "old_runs": e["old"],
                "new_runs": e["new"],
            }
        print(json.dumps(report))
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", wt],
                       capture_output=True)


if __name__ == "__main__":
    main()
