#!/bin/sh
# Opt-in big-tier CI: runs the crown-jewel (big/slow) tests and appends a
# dated pass/fail section to TESTLOG_big.md so the claims stay artifacts,
# not commit messages.  Usage: scripts/run_big_tier.sh [pytest-args]
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y-%m-%dT%H:%M:%SZ)
LOG=$(mktemp)
START=$(date +%s)
# capture pytest's own status (a `| tee` pipe would report tee's instead
# under plain sh, logging "exit 0" even when the tests fail)
python -m pytest -m "big" -q --no-header "$@" > "$LOG" 2>&1
RC=$?
cat "$LOG"
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
