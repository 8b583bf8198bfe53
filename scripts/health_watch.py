#!/usr/bin/env python
"""Healthy-window watcher for the scaling gate (BASELINE.md protocol).

This VM's throughput swings 2x on tens-of-minutes timescales and the
north-rule scaling evidence is only meaningful in a healthy window
(mp-ceiling ~240k docs/s text; degraded 92-190k — see CLAUDE.md and the
r04 probe history). Probing by hand missed every window in r04, so this
script automates the vigil: probe the pure-multiprocessing extraction
ceiling every --interval seconds, log each reading, and the moment the
ceiling clears --threshold launch ``scripts/scaling_bench.py`` with
nothing else running. The freshly written BENCH/BASELINE_latest.md is
copied to BENCH/BASELINE_r05_gate.md so a later (possibly degraded)
manual run can't clobber the gate evidence.

While this is armed, NOTHING else may run on the box (a concurrent
local[8] pytest suite once halved a local[32] timing round).

Usage: python scripts/health_watch.py [--threshold 230000] [--interval 600]
       [--max-probes 30] [--pages 120000] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import machine_ceiling  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "probe_r05.log")


def log(msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as fh:
        fh.write(line + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=230000)
    ap.add_argument("--interval", type=float, default=600)
    ap.add_argument("--max-probes", type=int, default=30)
    ap.add_argument("--pages", type=int, default=120000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    for i in range(args.max_probes):
        c = machine_ceiling(32, 64000, pin=False)
        log(f"probe {i}: {json.dumps(c)} (healthy >= {args.threshold:.0f})")
        if c["text"] >= args.threshold:
            log(f"HEALTHY window — launching scaling_bench "
                f"{args.pages} {args.rounds}")
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
                 str(args.pages), str(args.rounds)],
                capture_output=True, text=True,
            )
            log(f"scaling_bench exit={r.returncode}")
            for ln in r.stdout.strip().splitlines()[-8:]:
                log(f"  {ln}")
            if r.returncode == 0:
                shutil.copy(
                    os.path.join(REPO, "BENCH", "BASELINE_latest.md"),
                    os.path.join(REPO, "BENCH", "BASELINE_r05_gate.md"),
                )
                log("gate evidence copied to BENCH/BASELINE_r05_gate.md")
                return 0
            log(f"stderr tail: {r.stderr.strip().splitlines()[-3:]}")
            return 1
        time.sleep(args.interval)
    log("no healthy window within probe budget")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
