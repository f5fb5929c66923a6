"""Summarize the tools/headtohead_ch.sh speed comparison.

Reads our run's metrics.jsonl and the reference baseline's timestamped wandb
stream, computes per-phase ms/step from per-epoch wall-clock deltas (skipping
each phase's first epoch, which carries the compile), and prints a table plus a
JSON line for results/r3/headtohead_ch.json.
"""

from __future__ import annotations

import json
import sys


def _epoch_times_ours(path):
    """[(epoch, t, phase)] from our per-epoch train_mse_epoch records."""
    out = []
    for line in open(path):
        r = json.loads(line)
        if "train_mse_epoch" in r and "epoch" in r:
            out.append((int(r["epoch"]), float(r["t"]), r.get("phase", "?")))
    return out


def _epoch_times_ref(path):
    out = []
    for line in open(path):
        r = json.loads(line)
        if "train_mse_epoch" in r and "_t" in r:
            out.append((int(r["_epoch"]), float(r["_t"]), None))
    return out


def _phase_ms_per_step(times, lo, hi, steps_per_epoch):
    """Mean ms/step over epochs (lo, hi] using wall deltas between epoch records."""
    ts = {e: t for e, t, _ in times}
    pairs = [(e, e + 1) for e in range(lo, hi) if e in ts and e + 1 in ts]
    if not pairs:
        return None
    deltas = [ts[b] - ts[a] for a, b in pairs]
    return 1000.0 * sum(deltas) / (len(deltas) * steps_per_epoch)


def main():
    ours = _epoch_times_ours(sys.argv[1] if len(sys.argv) > 1 else "/tmp/h2h_ours/metrics.jsonl")
    ref = _epoch_times_ref(sys.argv[2] if len(sys.argv) > 2 else "/tmp/h2h_ref_log.jsonl")
    steps = 16  # 64 signals / batch 4
    rows = {}
    for name, times in [("ours", ours), ("reference", ref)]:
        nef = _phase_ms_per_step(times, 2, 7, steps)   # skip epochs 1-2 (compile tail)
        ode = _phase_ms_per_step(times, 9, 12, steps)  # skip epoch 8 (ode compile)
        rows[name] = {"nef_ms_per_step": nef, "ode_ms_per_step": ode}
        print(f"{name:10s} nef {nef and round(nef,1)} ms/step   ode {ode and round(ode,1)} ms/step")
    o, r = rows["ours"], rows["reference"]
    for k in ("nef_ms_per_step", "ode_ms_per_step"):
        if o.get(k) and r.get(k):
            rows[f"speedup_{k[:3]}"] = round(r[k] / o[k], 3)
            print(f"speedup ({k[:3]}): {rows[f'speedup_{k[:3]}']}x")
    with open("results/r3/headtohead_ch.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
