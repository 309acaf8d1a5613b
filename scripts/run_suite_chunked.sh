#!/usr/bin/env bash
# Chunked per-file test-suite runner for small hosts.
#
# Why: cold XLA CPU compiles dominate the suite on a 1-core box (hours
# in one process). With the persistent compile cache a warm chunked run
# is ~17 min — and chunking isolates the rare XLA AOT-export segfault a
# big fresh compile can hit with the cache enabled (see
# .claude/skills/verify/SKILL.md), so one crash costs one file, not the
# run. Usage:
#   scripts/run_suite_chunked.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export AWSM_JAX_CPU_CACHE="${AWSM_JAX_CPU_CACHE:-$HOME/.cache/awsm_jax_cpu}"
unset PALLAS_AXON_POOL_IPS

fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    if ! timeout 3600 python -m pytest "$f" -q "$@"; then
        echo "!!! $f FAILED (rc=$?)"
        fail=1
    fi
done
exit $fail
