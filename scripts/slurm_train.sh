#!/bin/bash
# SLURM launcher template for multi-host TPU training.
#
# Counterpart of ss_baselines/savi/slurm.sh (2 nodes × 2 GPUs, GLOO): on TPU
# pods each host runs the same SPMD program; jax.distributed.initialize()
# picks up the coordinator from the environment, and preemption signals are
# handled by avlen_tpu.utils.preemption (SIGUSR1 → save interrupted state +
# scontrol requeue).
#
#SBATCH --job-name=avlen_tpu
#SBATCH --output=logs/avlen_%j.out
#SBATCH --nodes=1
#SBATCH --ntasks-per-node=1
#SBATCH --signal=USR1@120
#SBATCH --requeue

set -euo pipefail

EXP_CONFIG=${1:-configs/semantic_audionav/savi/savi_interactive_1st_stage.yaml}
MODEL_DIR=${2:-runs/$SLURM_JOB_ID}

export JAX_COORDINATOR_ADDRESS=${JAX_COORDINATOR_ADDRESS:-$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n 1)}

srun python -m avlen_tpu.run \
    --run-type train \
    --exp-config "$EXP_CONFIG" \
    --model-dir "$MODEL_DIR" \
    RESUME_CHECKPOINT True
