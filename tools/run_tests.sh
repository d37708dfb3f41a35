#!/usr/bin/env bash
# Scripted shard runner for the full test suite (VERDICT r2 item 8,
# r3 item 5: the run now writes a committed timing+result artifact).
#
# The suite is ~30 min on a 1-CPU box; CLAUDE.md documents a manual
# 3-way split — this script IS that split, timed, with a fail-fast
# summary, so "the full suite is green" is one command:
#
#   bash tools/run_tests.sh            # all three shards, sequential
#   bash tools/run_tests.sh 2          # just shard 2
#   PYTEST_ARGS="-x" bash tools/run_tests.sh
#
# Each run appends per-shard pass/fail counts + wall time to
# docs/data/test_run.json (newest run first), so the end-of-round
# "suite green" claim is backed by a committed record.
#
# Shards:
#   1  everything except models + config zoo (fast core/engine/data/apis)
#   2  tests/test_models (per-component model tests)
#   3  tests/test_config_zoo.py + zoo forward tier (config sweeps)
#   smoke  ~5-min cross-cutting tier: converters, registries, value
#          oracles, segmentor protocol — run before EVERY commit
#          (bash tools/run_tests.sh smoke); full suite before snapshot.
set -u
cd "$(dirname "$0")/.."

# pytest.ini addopts already has -q; adding another makes -qq which
# suppresses the final count line the artifact parses
PYTEST="python -m pytest ${PYTEST_ARGS:-}"
declare -A NAMES CMDS
NAMES[1]="core/engine/data/apis/tools"
CMDS[1]="$PYTEST tests/ --ignore=tests/test_models --ignore=tests/test_config_zoo.py --ignore=tests/test_zoo_forward_tier.py"
NAMES[2]="models"
CMDS[2]="$PYTEST tests/test_models"
NAMES[3]="config zoo sweeps"
CMDS[3]="$PYTEST tests/test_config_zoo.py tests/test_zoo_forward_tier.py"
NAMES[smoke]="smoke tier (pre-commit)"
CMDS[smoke]="$PYTEST tests/test_utils/test_backbone_convert.py tests/test_utils/test_torch_convert.py tests/test_models/test_registry_parity.py tests/test_models/test_neck_oracles.py tests/test_models/test_backbones/test_backbone_oracles_b3.py tests/test_models/test_segmentors"

ART=docs/data/test_run.json
declare -a RESULTS

run_shard() {
    local i=$1
    echo "=== shard $i (${NAMES[$i]}) ==="
    local t0=$SECONDS
    local log
    log=$(mktemp)
    ${CMDS[$i]} 2>&1 | tee "$log"
    local rc=${PIPESTATUS[0]}
    local dt=$((SECONDS - t0))
    # last pytest summary line, e.g. "631 passed, 2 skipped in 612.33s"
    local summary
    summary=$(grep -Eo '[0-9]+ (passed|failed|error|skipped)[^=]*' "$log" | tail -1 | sed 's/[[:space:]]*$//')
    rm -f "$log"
    echo "=== shard $i rc=$rc in ${dt}s ==="
    RESULTS+=("{\"shard\": \"$i\", \"name\": \"${NAMES[$i]}\", \"rc\": $rc, \"wall_s\": $dt, \"summary\": \"${summary:-unknown}\"}")
    return $rc
}

write_artifact() {
    local overall=$1
    python - "$overall" "${RESULTS[@]}" <<'EOF'
import json, subprocess, sys, datetime
overall = int(sys.argv[1])
shards = [json.loads(s) for s in sys.argv[2:]]
rev = subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                     capture_output=True, text=True).stdout.strip()
rec = {'utc': datetime.datetime.now(datetime.timezone.utc)
       .strftime('%Y-%m-%dT%H:%M:%SZ'),
       'git': rev, 'green': overall == 0, 'shards': shards}
path = 'docs/data/test_run.json'
try:
    runs = json.load(open(path))
except Exception:
    runs = []
runs.insert(0, rec)
with open(path, 'w') as f:
    json.dump(runs[:10], f, indent=1)
    f.write('\n')
print(f'recorded run → {path} (green={rec["green"]})')
EOF
}

overall=0
if [[ $# -ge 1 ]]; then
    run_shard "$1" || overall=1
else
    for i in 1 2 3; do
        run_shard "$i" || overall=1
    done
fi
write_artifact $overall
exit $overall
