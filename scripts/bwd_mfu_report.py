#!/usr/bin/env python
"""Backward-path MFU accounting report (VERDICT r4 directive #5).

Parses docs/evidence/r5_bwd_mfu/*.log (written by scripts/abl_bwd_mfu.sh:
each phase runs bench.py twice in its own process; each run prints a
`[bench] ...` stderr line and one JSON metric line) and prints the
train-step decomposition table:

  * per-phase samples/s (both reps -> own +-spread), ms/sample
  * delta vs base in ms/sample -> the component's share of the step
  * fwd-vs-train gap: eval576 rate vs base rate at the same effective
    batch -> how much of the 0.49->0.39 MFU drop each ablation explains

Usage: python scripts/bwd_mfu_report.py [evidence_dir]
"""

import glob
import json
import os
import re
import sys


def parse(path):
    rates = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and "samples_per_sec" in line:
                j = json.loads(line)
                rates.append((j["value"], j))
    return rates


def main():
    evid = sys.argv[1] if len(sys.argv) > 1 else "docs/evidence/r5_bwd_mfu"
    phases = {}
    for path in sorted(glob.glob(os.path.join(evid, "*.log"))):
        tag = re.sub(r"\.log$", "", os.path.basename(path))
        got = parse(path)
        if got:
            phases[tag] = got
    if "base" not in phases:
        raise SystemExit(f"no base.log with metrics under {evid}")

    base_rates = [v for v, _ in phases["base"]]
    base = max(base_rates)  # best-of-reps (process spread is one-sided slow)
    base_ms = 1e3 / base
    print(f"{'phase':10s} {'samples/s (reps)':>24s} {'ms/sample':>10s} "
          f"{'d vs base':>10s} {'note'}")
    for tag, got in sorted(phases.items()):
        rates = [v for v, _ in got]
        best = max(rates)
        ms = 1e3 / best
        delta = ms - base_ms
        reps = "/".join(f"{r:.1f}" for r in rates)
        j = got[0][1]
        mfu = j.get("mfu")
        note = f"mfu={mfu}" if mfu is not None else ""
        print(f"{tag:10s} {reps:>24s} {ms:10.4f} {delta:+10.4f} {note}")

    if "eval576" in phases:
        ev = max(v for v, _ in phases["eval576"])
        print(f"\nfwd-only rate {ev:.1f}/s vs train {base:.1f}/s -> "
              f"train step costs {ev/base:.2f}x the fwd pass per sample")
        print("(a pure fwd+bwd at 2x fwd FLOPs with equal efficiency "
              "would cost 3.0x; less than 3.0x means the bwd path runs "
              "at HIGHER hardware utilization than fwd, not lower)")


if __name__ == "__main__":
    main()
