#!/bin/bash
# Continuous probe-bracketed 450k scaling pairs (BENCH/BASELINE.md protocol).
# Runs run_pair.sh back-to-back so any clean ambient window that appears is
# captured; each pair self-records probes + the in-run span index, so every
# iteration extends the ambient-evidence series regardless of window quality.
# Stop with: tmux kill-session -t pairs   (or touch /tmp/stop_pairs)
set -u
cd /root/repo
i=${1:-1}
while [ ! -f /tmp/stop_pairs ]; do
  TAG=head_r5_loop$(printf '%02d' "$i")
  bash BENCH/r5/run_pair.sh "$TAG"
  i=$((i+1))
done
echo "loop stopped at i=$i"
