"""Interleaved same-host A/B of HEAD's bench against a committed baseline
rev (verdict r8 #7: make cross-round bench comparisons drift-proof).

Runs bench.py alternately from a worktree checkout of <rev> and from the
current repo (A B A B ..., --passes each), compares per-query MINIMA, and
writes BENCH_AB.json {rev, head, passes, host, per_query: {name: {base_min,
head_min, ratio}}, geomean_ratio}. Because the two arms interleave within
one session on one host, ambient drift hits both arms equally — a ratio
far from 1.0 is attributable to the code, unlike a raw cross-round diff.

Usage: python scripts/bench_ab_freeze.py <rev> [--passes N] [--out FILE]
Run at round freeze with the PREVIOUS round's freeze commit as <rev>.
"""

import json
import math
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(workdir: str, tag: str, idx: int) -> dict:
    out_path = os.path.join(
        tempfile.gettempdir(), f"bench_ab_{tag}_{idx}_{os.getpid()}.json"
    )
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env["BULKER_BENCH_OUT"] = out_path
    res = subprocess.run(
        [sys.executable, os.path.join(workdir, "bench.py")],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
    )
    if res.returncode != 0:
        raise RuntimeError(f"bench.py rc={res.returncode}: {res.stderr[-500:]}")
    with open(out_path) as fh:
        detail = json.load(fh)
    os.unlink(out_path)
    return detail


def main() -> None:
    args = sys.argv[1:]
    if not args:
        sys.exit("usage: bench_ab_freeze.py <rev> [--passes N] [--out FILE]")
    rev = args[0]
    passes = 2
    out_file = os.path.join(REPO, "BENCH_AB.json")
    i = 1
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        elif args[i] == "--out":
            out_file = args[i + 1]
            i += 2
        else:
            sys.exit(f"unknown arg {args[i]}")

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    wt = tempfile.mkdtemp(prefix="bench_ab_wt_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, rev],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        base_runs, head_runs, hosts = [], [], []
        for p in range(passes):
            print(f"pass {p + 1}/{passes}: baseline {rev}", flush=True)
            base_runs.append(run_bench(wt, "base", p))
            print(f"pass {p + 1}/{passes}: HEAD {head}", flush=True)
            head_runs.append(run_bench(REPO, "head", p))
        for d in base_runs + head_runs:
            if "host" in d:
                hosts.append(d["host"])

        def mins(runs):
            out = {}
            for d in runs:
                for k, v in d["queries"].items():
                    if isinstance(v, (int, float)):
                        out[k] = min(out.get(k, v), v)
            return out

        bm, hm = mins(base_runs), mins(head_runs)
        per_query, logs = {}, []
        for k in sorted(set(bm) & set(hm)):
            if hm[k] > 0 and bm[k] > 0:
                ratio = round(bm[k] / hm[k], 3)  # >1 = HEAD faster
                per_query[k] = {
                    "base_min": bm[k], "head_min": hm[k], "ratio": ratio,
                }
                logs.append(math.log(ratio))
        record = {
            "baseline_rev": rev,
            "head_rev": head,
            "passes": passes,
            "n_common": len(per_query),
            "geomean_ratio": round(math.exp(sum(logs) / len(logs)), 3)
            if logs else None,
            "host_samples": hosts,
            "per_query": per_query,
        }
        with open(out_file, "w") as fh:
            json.dump(record, fh, indent=1)
            fh.write("\n")
        print(f"wrote {out_file}: geomean_ratio={record['geomean_ratio']} "
              f"over {len(per_query)} queries")
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    main()
