"""Core-count sensitivity check: bench headline at local[4] vs local[32].

A plan can look healthy at 32 cores and fall over at lower (or much
higher) parallelism — e.g. a stage that serializes on one fat
partition is masked when 31 other cores absorb the rest of the work.
This tool runs the identical bench.py headline twice (fresh process
per core count — the Spark session is per-JVM) and reports, per
query, the slowdown at 4 cores relative to 32.

Reading the ratio: with 8x fewer cores, a perfectly CPU-bound
embarrassingly-parallel stage degrades up to 8x; fixed driver/plan
latency degrades ~1x. Ratios WELL ABOVE 8x are the signal — they mean
contention, spill, or a single-task bottleneck that extra cores were
hiding. Results go into SCALE.md.

Usage: python tools/core_sensitivity.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    # bench.py prints two JSON lines since r10 (full dict first, short
    # tail-safe summary last); this tool needs the per-query dict, so
    # take the LAST line whose "queries" map is non-empty
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("queries"):
            return d
    raise RuntimeError("no bench JSON line with per-query timings")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, nargs=2, default=(32, 4))
    args = ap.parse_args()

    hi, lo = args.cores
    wide = run_bench(args.sf_dir, hi)
    narrow = run_bench(args.sf_dir, lo)

    rows = []
    for name, t_hi in wide["queries"].items():
        t_lo = narrow["queries"].get(name)
        if t_lo is None:
            continue
        rows.append((name, t_hi, t_lo,
                     round(t_lo / t_hi, 2) if t_hi > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])

    print(f"{'query':38s} {f'local[{hi}]':>10s} {f'local[{lo}]':>10s} "
          f"{'ratio':>6s}")
    for name, t_hi, t_lo, ratio in rows:
        flag = "  <-- exceeds core ratio" if ratio > hi / lo else ""
        print(f"{name:38s} {t_hi:10.3f} {t_lo:10.3f} {ratio:6.2f}{flag}")
    print(json.dumps({
        "metric": "core_sensitivity",
        "cores": [hi, lo],
        "total_wide": wide["value"],
        "total_narrow": narrow["value"],
        "worst": rows[0][0] if rows else None,
        "exceed_core_ratio": [r[0] for r in rows if r[3] > hi / lo],
    }))


if __name__ == "__main__":
    main()
