"""Two-cluster-size scaling evidence (north_rule, sandboxed per BASELINE.md):
run bench.py at local[8] and local[32] on identical input, report docs/sec
at both plus scaling_efficiency = (throughput_32 / throughput_8) / 4.

Writes BENCH/BASELINE.md. Usage: python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_pages: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_PAGES=str(n_pages),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_DRIVER_MEM="24g",  # same JVM heap both runs (protocol)
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    r8 = run_bench(8, n_pages, sf_dir)
    r32 = run_bench(32, n_pages, sf_dir)

    eff_text = (r32["docs_per_sec_text"] / r8["docs_per_sec_text"]) / 4
    eff_full = (r32["docs_per_sec_full"] / r8["docs_per_sec_full"]) / 4

    lines = [
        "# BENCH/BASELINE — measured throughput & scaling evidence",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} by "
        "`scripts/scaling_bench.py` (protocol: BASELINE.md — same input files, "
        "same JVM heap, warm page cache via one discarded warm-up run, "
        "`spark.sql.shuffle.partitions` scaled with cores, AQE on in both).",
        "",
        f"Input: {n_pages} deterministic synthetic pages (seed=42, FIXTURES.md) "
        f"+ {sf_dir} tables.",
        "",
        "| metric | local[8] (N) | local[32] (4N) | scaling efficiency |",
        "|---|---|---|---|",
        f"| docs/sec extracted (text-only path) | {r8['docs_per_sec_text']:.0f} "
        f"| {r32['docs_per_sec_text']:.0f} | **{eff_text:.3f}** |",
        f"| docs/sec extracted (full spans struct) | {r8['docs_per_sec_full']:.0f} "
        f"| {r32['docs_per_sec_full']:.0f} | **{eff_full:.3f}** |",
        f"| bench total (sec) | {r8['value']} | {r32['value']} | — |",
        "",
        "Gate: scaling efficiency ≥ 0.8 between cluster sizes N and 4N "
        "(BASELINE.json north_rule). Reference publishes no absolute numbers "
        "(BASELINE.md).",
        "",
        "## Per-query seconds",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in r8["queries"]:
        lines.append(f"| {q} | {r8['queries'][q]} | {r32['queries'][q]} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r8),
        json.dumps(r32),
        "```",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out_path}")
    print(f"efficiency text={eff_text:.3f} full={eff_full:.3f}")


if __name__ == "__main__":
    main()
