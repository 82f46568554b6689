#!/bin/bash
# Continuous probe-bracketed 450k scaling pairs (BENCH/BASELINE.md protocol).
# Runs run_pair.sh back-to-back so any clean ambient window that appears is
# captured; each pair self-records probes + the in-run span index, so every
# iteration extends the ambient-evidence series regardless of window quality.
# Stop with: tmux kill-session -t pairs   (or touch /tmp/stop_pairs)
set -u
cd /root/repo
# A leftover stop marker from a previous session would end the loop
# before the first pair — clear it at startup (round-5 ADVICE item).
rm -f /tmp/stop_pairs
# Default the starting index to one past the highest existing log so a
# restart without the index argument never appends a second pair into a
# prior series log (run_pair.sh opens its log with '>>').
if [ $# -ge 1 ]; then
  i=$1
else
  last=$(ls BENCH/r5/head_r5_loop*.log 2>/dev/null |
    sed 's/.*loop0*\([0-9]*\)\.log/\1/' | sort -n | tail -1)
  i=$(( ${last:-0} + 1 ))
fi
while [ ! -f /tmp/stop_pairs ]; do
  TAG=head_r5_loop$(printf '%02d' "$i")
  if [ -f "BENCH/r5/${TAG}.log" ]; then
    echo "refusing to append to existing BENCH/r5/${TAG}.log; pass an explicit index" >&2
    exit 1
  fi
  bash BENCH/r5/run_pair.sh "$TAG"
  i=$((i+1))
done
echo "loop stopped at i=$i"
