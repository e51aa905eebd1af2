#!/usr/bin/env python
"""MoE quality A/B report (VERDICT r4 directive #3): dense
WeatherBERT-large vs MoE-large-E8 (ragged, dropless) — does the MoE's
extra capacity buy validation loss per unit wall-clock, not just
samples/s?

Reads the two wm-pretrain output JSONs (losses.val.total_loss +
metrics.epoch_seconds per epoch, train/trainer.py:454-464) and reports:
  * val loss at EQUAL EPOCHS (same optimizer steps over the same corpus)
  * val loss at EQUAL WALL-CLOCK (each curve linearly interpolated on
    its own cumulative epoch_seconds, compared at the smaller total)

Usage: python scripts/moe_ab_report.py dense_output.json moe_output.json
"""

import json
import sys

import numpy as np


def curve(path):
    with open(path) as f:
        j = json.load(f)
    val = np.asarray(j["losses"]["val"]["total_loss"], np.float64)
    secs = np.asarray(j["metrics"]["epoch_seconds"], np.float64)
    n = min(len(val), len(secs))
    return val[:n], np.cumsum(secs[:n])


def at_time(val, t_cum, t):
    """Best (min) val loss achieved by wall-clock time t."""
    seen = t_cum <= t
    if not seen.any():
        return float("nan")
    return float(np.min(val[seen]))


def main():
    dense_path, moe_path = sys.argv[1], sys.argv[2]
    dv, dt = curve(dense_path)
    mv, mt = curve(moe_path)
    print(f"{'epoch':>5} {'dense_val':>10} {'dense_t':>8} "
          f"{'moe_val':>10} {'moe_t':>8}")
    for i in range(max(len(dv), len(mv))):
        ds = f"{dv[i]:10.5f} {dt[i]:8.1f}" if i < len(dv) else " " * 19
        ms = f"{mv[i]:10.5f} {mt[i]:8.1f}" if i < len(mv) else ""
        print(f"{i:>5} {ds} {ms}")
    n = min(len(dv), len(mv))
    print(f"\nEQUAL EPOCHS ({n}): dense {np.min(dv[:n]):.5f} "
          f"vs moe {np.min(mv[:n]):.5f} "
          f"({'moe' if mv[:n].min() < dv[:n].min() else 'dense'} wins by "
          f"{abs(dv[:n].min() - mv[:n].min()):.5f})")
    t_eq = min(dt[-1], mt[-1])
    d_at, m_at = at_time(dv, dt, t_eq), at_time(mv, mt, t_eq)
    print(f"EQUAL WALL-CLOCK ({t_eq:.0f}s): dense {d_at:.5f} vs "
          f"moe {m_at:.5f} "
          f"({'moe' if m_at < d_at else 'dense'} wins by "
          f"{abs(d_at - m_at):.5f})")
    # steady-state per-epoch time (epochs 2+) excludes the jit-compile
    # cost buried in epoch 0 (cold-cache compile asymmetry — MoE compiles
    # are several minutes longer than dense — would otherwise bias the
    # wall-clock comparison toward dense on short runs)
    d_ep = float(np.mean(np.diff(dt)[1:])) if len(dt) > 2 else float("nan")
    m_ep = float(np.mean(np.diff(mt)[1:])) if len(mt) > 2 else float("nan")
    print(f"STEADY-STATE per-epoch: dense {d_ep:.1f}s vs moe {m_ep:.1f}s "
          f"(moe/dense = {m_ep / d_ep:.2f}x)")
    print(json.dumps({
        "equal_epochs": {"n": int(n), "dense": float(np.min(dv[:n])),
                         "moe": float(np.min(mv[:n]))},
        "equal_wallclock": {"seconds": float(t_eq), "dense": d_at,
                            "moe": m_at},
        "dense_total_s": float(dt[-1]), "moe_total_s": float(mt[-1]),
        "steady_state_epoch_s": {"dense": d_ep, "moe": m_ep},
    }))


if __name__ == "__main__":
    main()
