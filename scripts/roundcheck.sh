#!/usr/bin/env bash
# End-of-round mechanical invariant (r15 verdict item 2): the full
# ScalaTest suite AND the DuckDB oracle selfcheck must both be green
# AFTER the last test-touching commit of a round. This script refuses
# a stale tally by construction — it always runs the FULL suite from
# the CURRENT tree, parses sbt's own count line, and exits non-zero on
# any failure, so a "N/N" claim in PROFILE_r{N}.md can only ever be a
# quote of this script's output.
#
# Usage: scripts/roundcheck.sh [sfDir] [verifyOutDir]
#   sfDir        testdata dir for the Verify dump (default sf0.01)
#   verifyOutDir where Verify writes parquet (default /tmp/graft_roundcheck)
set -u
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/graft_roundcheck}"
LOG=$(mktemp /tmp/roundcheck.XXXXXX.log)
FAIL=0

echo "== roundcheck: git state =="
git rev-parse --short HEAD
if ! git diff --quiet || ! git diff --cached --quiet; then
  echo "note: working tree is DIRTY — tally reflects uncommitted code"
fi

echo "== roundcheck: full sbt test =="
sbt test >"$LOG" 2>&1
SBT_RC=$?
TALLY=$(grep -E '^\[info\] Tests: succeeded' "$LOG" | tail -1)
echo "$TALLY"
TOTAL=$(grep -E '^\[info\] Total number of tests run:' "$LOG" | tail -1)
echo "$TOTAL"
# Green means: sbt exited 0 AND the tally line exists AND it shows
# zero failed AND zero canceled (a canceled test is work that did not
# run — it must not pass the gate, r16 advice).
if [ $SBT_RC -ne 0 ] || [ -z "$TALLY" ] \
   || ! echo "$TALLY" | grep -q 'failed 0' \
   || ! echo "$TALLY" | grep -q 'canceled 0'; then
  echo "ROUNDCHECK: sbt test NOT GREEN (rc=$SBT_RC) — see $LOG"
  grep -E '^\[info\] .*\*\*\* FAILED' "$LOG" | head -20
  FAIL=1
else
  echo "ROUNDCHECK: sbt test green"
fi

echo "== roundcheck: Verify dump at $SF_DIR =="
rm -rf "$OUT_DIR"
sbt "runMain graft.Verify $SF_DIR $OUT_DIR" >>"$LOG" 2>&1
if [ $? -ne 0 ]; then
  echo "ROUNDCHECK: Verify FAILED — see $LOG"
  FAIL=1
else
  echo "== roundcheck: DuckDB oracle selfcheck =="
  SC=$(python3 scripts/selfcheck.py "$SF_DIR" "$OUT_DIR" 2>&1)
  SC_RC=$?
  echo "$SC" | tail -5
  # Green means: selfcheck exited 0 AND printed no FAIL line AND its
  # final "== N ok, 0 fail ==" tally is present. A crash before the
  # per-query loop (import error, missing dir) has no ^FAIL lines but
  # a non-zero rc and no tally — it must not pass (r16 advice, medium).
  if [ $SC_RC -ne 0 ] || echo "$SC" | grep -q '^FAIL' \
     || ! echo "$SC" | grep -qE '^== [0-9]+ ok, 0 fail'; then
    echo "ROUNDCHECK: selfcheck NOT GREEN (rc=$SC_RC)"
    echo "$SC" | grep '^FAIL' | head -20
    FAIL=1
  else
    echo "ROUNDCHECK: selfcheck green"
  fi
fi

if [ $FAIL -ne 0 ]; then
  echo "ROUNDCHECK VERDICT: RED — do not close the round"
  exit 1
fi
echo "ROUNDCHECK VERDICT: GREEN ($TALLY)"
