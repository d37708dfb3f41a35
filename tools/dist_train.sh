#!/usr/bin/env bash
# Multi-host training launcher (≙ reference tools/dist_train.sh).
#
# Under jax there is no per-GPU process launch: ONE process per host drives
# all local chips, and multi-host init happens through the TPU runtime
# environment (JAX_COORDINATOR_ADDRESS / cloud metadata). On a TPU pod slice
# simply run this script on every host (e.g. with `gcloud compute tpus
# tpu-vm ssh --worker=all`).
CONFIG=$1
shift || true
python "$(dirname "$0")"/train.py "$CONFIG" --launcher jax "$@"
