#!/bin/bash
# Copy committed-size evidence from outputs/r2 into results/r2: final metrics
# lines + one rollout figure per experiment.
cd /root/repo
mkdir -p results/r2
for d in outputs/r2/*_s*; do
  tag=$(basename $d)
  [ -f $d/metrics.jsonl ] || continue
  mkdir -p results/r2/$tag
  tail -40 $d/metrics.jsonl > results/r2/$tag/metrics_tail.jsonl
done
# one figure per experiment family (seed 0)
for d in outputs/r2/*_s0; do
  tag=$(basename $d)
  fig=$(ls $d/figures/*.png 2>/dev/null | tail -1)
  [ -n "$fig" ] && cp $fig results/r2/$tag/
done
python tools/harvest_r2.py > results/r2/SUMMARY.md 2>/dev/null
du -sh results/r2
