#!/bin/bash
# ≙ reference docker/serve/entrypoint.sh: `serve` starts the model server,
# anything else is eval'd. CONFIG/CHECKPOINT point at the mounted model.
set -e

if [[ "$1" = "serve" ]]; then
    shift 1
    exec python tools/serve/serve_model.py \
        "${CONFIG:?set CONFIG=/path/to/config.py}" \
        "${CHECKPOINT:?set CHECKPOINT=/path/to/model.ckpt}" \
        --host "${HOST:-0.0.0.0}" --port "${PORT:-8080}"
else
    eval "$@"
fi
