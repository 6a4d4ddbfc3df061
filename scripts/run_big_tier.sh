#!/bin/sh
# Opt-in big-tier CI: runs the crown-jewel (big/slow) tests and appends a
# dated pass/fail section to TESTLOG_big.md so the claims stay artifacts,
# not commit messages.  Usage: scripts/run_big_tier.sh [pytest-args]
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y-%m-%dT%H:%M:%SZ)
LOG=$(mktemp)
START=$(date +%s)
python -m pytest -m "big" -q --no-header "$@" 2>&1 | tee "$LOG"
RC=$?
DUR=$(( $(date +%s) - START ))
{
  echo ""
  echo "## $STAMP — big tier (exit $RC, ${DUR}s)"
  echo ""
  echo '```'
  tail -5 "$LOG"
  echo '```'
} >> TESTLOG_big.md
rm -f "$LOG"
exit $RC
