#!/usr/bin/env bash
# CI gate (VERDICT r4 item 8): full test suite under the line-coverage
# monitor, failing below COVERAGE_FLOOR (default 88%). Run after any
# substantive change:
#     bash tools/ci_gate.sh
set -euo pipefail
cd "$(dirname "$0")/.."
python tools/coverage_report.py tests/ -q
echo "ci_gate: PASS (tests green, coverage >= ${COVERAGE_FLOOR:-88}%)"
