#!/usr/bin/env bash
# Scripted shard runner for the full test suite (VERDICT r2 item 8).
#
# The suite is ~30 min on a 1-CPU box; CLAUDE.md documents a manual
# 3-way split — this script IS that split, timed, with a fail-fast
# summary, so "the full suite is green" is one command:
#
#   bash tools/run_tests.sh            # all three shards, sequential
#   bash tools/run_tests.sh 2          # just shard 2
#   PYTEST_ARGS="-x" bash tools/run_tests.sh
#
# Shards:
#   1  everything except models + config zoo (fast core/engine/data/apis)
#   2  tests/test_models (per-component model tests)
#   3  tests/test_config_zoo.py + zoo forward tier (config sweeps)
set -u
cd "$(dirname "$0")/.."

PYTEST="python -m pytest -q ${PYTEST_ARGS:-}"
declare -a NAMES CMDS
NAMES[1]="core/engine/data/apis/tools"
CMDS[1]="$PYTEST tests/ --ignore=tests/test_models --ignore=tests/test_config_zoo.py --ignore=tests/test_zoo_forward_tier.py"
NAMES[2]="models"
CMDS[2]="$PYTEST tests/test_models"
NAMES[3]="config zoo sweeps"
CMDS[3]="$PYTEST tests/test_config_zoo.py tests/test_zoo_forward_tier.py"

run_shard() {
    local i=$1
    echo "=== shard $i (${NAMES[$i]}) ==="
    local t0=$SECONDS
    ${CMDS[$i]}
    local rc=$?
    echo "=== shard $i rc=$rc in $((SECONDS - t0))s ==="
    return $rc
}

overall=0
if [[ $# -ge 1 ]]; then
    run_shard "$1" || overall=1
else
    for i in 1 2 3; do
        run_shard "$i" || overall=1
    done
fi
exit $overall
