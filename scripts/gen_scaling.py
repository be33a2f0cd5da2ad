"""Regenerate SCALING.md's 3-SF table from fresh bench runs.

Runs ``bench.py`` at sf0.001 / sf0.01 / sf0.1 (sequentially, so runs
don't contend for cores) and rewrites ONLY the table block of
SCALING.md — the prose and the measured sections below it are kept.
Usage: python scripts/gen_scaling.py
"""

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def run_bench(sf: str) -> dict:
    # route the per-query detail record to a scratch file: bench.py no
    # longer writes the committed BENCH_FULL.json unless told to
    out = os.path.join(tempfile.gettempdir(), f"bench_scaling_{sf}.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=f"/root/testdata/{sf}",
        BULKER_BENCH_OUT=out,
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
        check=True,
    )
    # the stdout line is trimmed to fit the driver's tail buffer; the
    # complete per-query record lands in the BULKER_BENCH_OUT file
    with open(out) as fh:
        return json.load(fh)


def main() -> None:
    results = {}
    for sf in SFS:
        print(f"bench {sf} ...", flush=True)
        results[sf] = run_bench(sf)
        print(f"  total {results[sf]['value']}s", flush=True)

    names = sorted(
        set().union(*(r["queries"].keys() for r in results.values()))
    )
    rows = []
    for n in names:
        vals = [results[sf]["queries"].get(n) for sf in SFS]
        ratio = (
            round(vals[2] / vals[1], 2)
            if vals[1] and vals[2] and vals[1] > 0
            else None
        )
        cells = [str(v) if v is not None else "—" for v in vals]
        rows.append(
            f"| {n} | {cells[0]} | {cells[1]} | {cells[2]} | "
            f"{ratio if ratio is not None else '—'} |"
        )
    totals = [results[sf]["value"] for sf in SFS]
    rows.append(
        f"| **suite total** | **{totals[0]}** | **{totals[1]}** | "
        f"**{totals[2]}** | "
        f"**{round(totals[2] / totals[1], 2) if totals[1] else '—'}** |"
    )
    table = (
        "| query | sf0.001 | sf0.01 | sf0.1 | ratio 0.01->0.1 (10x data) |\n"
        "|---|---|---|---|---|\n" + "\n".join(rows)
    )

    path = os.path.join(REPO, "SCALING.md")
    text = open(path).read()
    # replace the first markdown table (header through last |-row run)
    new = re.sub(
        r"\| query \| sf0\.001.*?\n(?:\|[^\n]*\n)+",
        table + "\n",
        text,
        count=1,
        flags=re.S,
    )
    # refresh the headline numbers in the intro prose
    new = re.sub(
        r"(\d+)-entry suite total only [\d.]+s -> [\d.]+s",
        f"{len(names)}-entry suite total only {totals[0]}s -> {totals[2]}s",
        new,
        count=1,
    )
    open(path, "w").write(new)
    print(f"SCALING.md table regenerated ({len(names)} queries)")


if __name__ == "__main__":
    main()
