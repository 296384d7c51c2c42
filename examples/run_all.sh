#!/bin/bash
# Acceptance harness (mirrors the reference's zscripts/run-examples.bash)
set -e
set -o pipefail
cd "$(dirname "$0")"
for f in ex_*.py; do
    echo "=== $f"
    # CPU acceptance harness: force local CPU (the harness shell
    # exports JAX_PLATFORMS=axon -> remote TPU, wrong here)
    JAX_PLATFORMS="${RUN_ALL_PLATFORM:-cpu}" python "$f" | tail -2
done
JAX_PLATFORMS="${RUN_ALL_PLATFORM:-cpu}" python ex_sparse_nd_splu.py
echo "ALL EXAMPLES PASSED"
