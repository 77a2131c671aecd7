#!/usr/bin/env bash
# Multi-host TPU-pod training launcher — the TPU-era equivalent of the
# reference's SLURM entry (sbatch_train_calvin.sh: srun -n4 --gres=gpu:4).
#
# On a TPU pod slice (e.g. v5e-16 = 4 hosts x 4 chips), run this script ON
# EVERY HOST (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all
# --command="bash scripts/launch_pod.sh"`). On Cloud TPU VMs
# jax.distributed.initialize() autodetects the coordinator and process
# ids, so distributed.enabled=true is all the wiring needed; elsewhere
# pass the coordinator/process flags explicitly (see README "multi-host").
#
# batch_size below is PER HOST (the loader shards the global batch by
# process id; mdt_policy_tpu/training.py assembles the global array with
# make_array_from_process_local_data). The reference recipe is 4 x 128.

set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG="${CONFIG:-configs/mdtv_calvin_d.yaml}"
DATA_DIR="${DATA_DIR:?set DATA_DIR to the CALVIN dataset root}"
RUN_NAME="${RUN_NAME:-mdtv_pod_$(date +%Y%m%d_%H%M%S)}"

exec python -m mdt_policy_tpu.training \
    --config "$CONFIG" \
    data.root_data_dir="$DATA_DIR" \
    run_name="$RUN_NAME" \
    distributed.enabled=true \
    "$@"
