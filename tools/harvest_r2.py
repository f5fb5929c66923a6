"""Harvest round-2 run results into a markdown table (3-seed means).

Reads the last occurrence of each validation metric from
``outputs/r2/<tag>_s<seed>/metrics.jsonl`` and prints per-experiment rows.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

KEYS = [
    "val_mse_in_t",
    "val_mse_out_t",
    "train_mse_in_t",
    "train_mse_out_t",
    "val_mse_in_t_dp5",
    "val_mse_in_t_dp10",
    "val_mse_in_t_dp50",
    "superres_mse_in_t",
    "superres_mse_out_t",
    "val_mse_in_t_dp0.5",
    "train_mse_epoch",
]


def last_metrics(path):
    out = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            for k in KEYS:
                if k in rec:
                    out[k] = rec[k]
    return out


def main(root="outputs/r2"):
    groups = defaultdict(dict)
    for d in sorted(glob.glob(os.path.join(root, "*_s[0-9]"))):
        m = re.match(r"(.+)_s(\d)$", os.path.basename(d))
        if not m:
            continue
        tag, seed = m.group(1), int(m.group(2))
        jl = os.path.join(d, "metrics.jsonl")
        if os.path.exists(jl):
            groups[tag][seed] = last_metrics(jl)

    print("| experiment | seeds | val_mse_in_t | val_mse_out_t | extras |")
    print("|---|---|---|---|---|")
    for tag, per_seed in groups.items():
        seeds = sorted(per_seed)
        vin = [per_seed[s].get("val_mse_in_t") for s in seeds]
        vout = [per_seed[s].get("val_mse_out_t") for s in seeds]

        def fmt(vals):
            vals = [v for v in vals if v is not None]
            if not vals:
                return "—"
            if len(vals) == 1:
                return f"{vals[0]:.3e}"
            return f"{np.mean(vals):.3e} ± {np.std(vals):.1e}"

        extras = []
        for k in ("val_mse_in_t_dp50", "superres_mse_in_t", "superres_mse_out_t"):
            vals = [per_seed[s].get(k) for s in seeds if per_seed[s].get(k) is not None]
            if vals:
                extras.append(f"{k}={np.mean(vals):.3e}")
        print(
            f"| {tag} | {seeds} | {fmt(vin)} | {fmt(vout)} | {'; '.join(extras) or '—'} |"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
