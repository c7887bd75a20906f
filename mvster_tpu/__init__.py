"""mvster_tpu — a TPU-native (JAX/XLA/Pallas) multi-view-stereo framework.

A from-scratch rebuild of the capabilities of MVSTER (ECCV 2022,
reference: JeffWang987/MVSTER) designed TPU-first:

  * core/     pure-jax geometry, sampling, depth-hypothesis schedulers, Sinkhorn OT
  * kernels/  Pallas cost-volume kernels + XLA reference implementations
  * nn/       flax modules (FPN, cost regularizers, mono decoder, ASFF, ...)
  * models/   MVS4Net cascade assembly + losses
  * data/     dataset registry (DTU / BlendedMVS / Tanks / ETH3D / general eval)
  * dist/     jax.sharding mesh setup, SPMD data-parallel train/infer steps
  * train/    training loop, LR schedules, checkpointing, metrics
  * infer/    depth inference, geometric-consistency filtering, point-cloud fusion
  * eval/     DTU point-cloud benchmark (Python replacement of the MATLAB pipeline)
  * tools/    torch-checkpoint converter, CLI entry points
"""

__version__ = "0.1.0"
