#!/bin/bash
# Multi-host TPU pod-slice launch template — replaces the reference's SLURM
# ibrun lines (script_synthetic.py:40-64). One process per host; JAX picks
# up the pod topology from the TPU runtime environment and
# parallel.mesh.distributed_init() wires jax.distributed.
#
# Usage (gcloud TPU VM pods):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
#     "cd pairwise-perturbation-tpu && bash scripts/launch_multihost.sh \
#        -model CP -tensor r -pp 1 -dim 6 -size 64 -rank 8 -mesh 4x8"
#
# The -mesh flag should multiply to the total chip count of the slice;
# V's largest modes are sharded across it (parallel/mesh.py), with
# cross-host reductions riding ICI/DCN via XLA collectives.
set -e
export JAX_PLATFORMS=${JAX_PLATFORMS:-tpu}
exec python -m pairwise_perturbation_tpu.cli test_als "$@"
