#!/usr/bin/env bash
# Multi-host eval launcher (≙ reference tools/dist_test.sh); see
# dist_train.sh for the jax launch model.
DATA_ROOT=$1
CONFIG=$2
CHECKPOINT=$3
shift 3 || true
python "$(dirname "$0")"/test.py "$DATA_ROOT" "$CONFIG" "$CHECKPOINT" \
    --launcher jax "$@"
