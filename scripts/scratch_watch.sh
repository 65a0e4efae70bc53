#!/bin/bash
# Scratch high-water sampler for the multi-executor validation
# (SCALING.md r12): samples du of each given directory every 5 s while
# a dump runs, printing a high-water line per dir on exit. Usage:
#   scripts/scratch_watch.sh <outFile> <dir...> &
# Kill (or let the parent kill) when the measured run finishes; the
# high-water summary appends to <outFile> continuously so a crash of
# the watched JVM loses nothing.
out="$1"; shift
declare -A hw
while :; do
  for d in "$@"; do
    # blockmgr dirs appear/disappear per executor; sum dir + children
    kb=$(du -sk "$d" 2>/dev/null | awk '{s+=$1} END {print s+0}')
    if [ "${kb:-0}" -gt "${hw[$d]:-0}" ]; then
      hw[$d]=$kb
      echo "$(date +%s) HIGHWATER $d ${kb} KB" >> "$out"
    fi
  done
  sleep 5
done
