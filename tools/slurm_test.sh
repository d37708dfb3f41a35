#!/usr/bin/env bash
# Slurm eval launcher (≙ reference tools/slurm_test.sh); see slurm_train.sh
# for the one-task-per-host TPU launch model.
set -x

PARTITION=$1
JOB_NAME=$2
DATA_ROOT=$3
CONFIG=$4
CHECKPOINT=$5
HOSTS=${HOSTS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:6}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${HOSTS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/test.py ${DATA_ROOT} ${CONFIG} ${CHECKPOINT} --launcher slurm ${PY_ARGS}
