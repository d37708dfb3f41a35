#!/usr/bin/env bash
# Slurm launcher (≙ reference tools/slurm_train.sh), TPU semantics: one task
# per HOST (not per chip) — jax drives all local chips from one process and
# multi-host init flows through the TPU runtime / JAX_COORDINATOR_ADDRESS.
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
HOSTS=${HOSTS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:4}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/train.py ${CONFIG} --launcher slurm ${PY_ARGS}
