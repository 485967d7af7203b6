#!/bin/bash -e
# Multi-host TPU pod launcher — the analogue of the reference's
# examples/skelly_sim_slurm_sbatch.sh (mpirun/srun replacement).
#
# Run the same command on EVERY host of the pod slice, e.g. with
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#       --command="cd /path/to/sim && bash skelly_sim_tpu_pod.sh"
#
# jax.distributed.initialize() (triggered by --distributed) picks up the
# coordinator address and process index from the TPU pod metadata; the
# fiber batch and shell operator rows shard over the global mesh
# (docs/distribution.md), so the same config runs unchanged from 1 chip
# to a full slice.

export SKELLY_LOG=${SKELLY_LOG:-INFO}

python -m skellysim_tpu.cli \
    --config-file="${1:-skelly_config.toml}" \
    --distributed \
    "${@:2}"
