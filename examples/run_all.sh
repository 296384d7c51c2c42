#!/bin/bash
# Acceptance harness (mirrors the reference's zscripts/run-examples.bash)
set -e
set -o pipefail
cd "$(dirname "$0")"
for f in ex_*.py; do
    echo "=== $f"
    JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}" python "$f" | tail -2
done
python ex_sparse_nd_splu.py
echo "ALL EXAMPLES PASSED"
