#!/bin/bash
# Snapshot finished round-3 runs from outputs/r3 (wiped on VM restart) into
# results/r3 (committed), then regenerate the canonical result table from ONE
# harvest over round-2 snapshots + round-3 runs (VERDICT r2 #8).
cd /root/repo
mkdir -p results/r3
for d in outputs/r3/*_s*; do
  [ -d "$d" ] || continue
  tag=$(basename $d)
  # Only snapshot COMPLETED runs: a partial tail would shadow a complete
  # round-2 row for the same tag/seed in the harvest merge.
  [ -f $d/metrics.jsonl ] && [ -f $d/DONE ] || continue
  mkdir -p results/r3/$tag
  # Keep sparse mid-run metrics (equivariance fires once at test_equiv_at_epoch,
  # superres once at the end) in the snapshot — a plain tail loses them and the
  # harvest row then changes across regenerations (VERDICT r4 weak/next #8).
  { grep -h '"equivariance_err_\|"superres_mse_' $d/metrics.jsonl; tail -60 $d/metrics.jsonl; } \
    | awk '!seen[$0]++' > results/r3/$tag/metrics_tail.jsonl
  touch results/r3/$tag/DONE
  fig=$(ls $d/figures/*.png 2>/dev/null | tail -1)
  [ -n "$fig" ] && cp -n $fig results/r3/$tag/ 2>/dev/null
done
python tools/harvest.py results/r2 results/r3 outputs/r3 > results/r3/SUMMARY.md
du -sh results/r3
