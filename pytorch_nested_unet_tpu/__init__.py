"""pytorch_nested_unet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
capabilities of husheng876/pytorch_nested-unet.

Design stance (see SURVEY.md §7): not a port. NHWC layout, functional params
(pytrees) via Flax linen, Optax optimizers, Orbax checkpoints, device-resident
jit-fused input pipeline, mesh data-parallelism via jax.sharding instead of
`.cuda()` calls, losses/metrics computed on device (no per-step host sync).

Subpackages:
  ops       — low-level NHWC ops: torch-semantics conv/BN wrappers,
              align-corners bilinear resize, pooling, Pallas kernels.
  models    — the model zoo (UNet, NestedUNet/UNet++, CRDN family, attention
              UNets, CA-Net, CascadePSP refinement) + registry.
  losses    — BCEDice / LovaszHinge / BCEWithLogits (on device).
  metrics   — IoU / Dice / pixel accuracy (on device).
  data      — dataset loaders, DSB2018 preprocessing, on-device augmentation.
  parallel  — mesh construction and sharding rules (data parallel + spatial).
  training  — train state, optimizers/schedulers, loops, checkpointing.
  utils     — config round-trip, meters, torch checkpoint conversion.
"""

__version__ = "0.1.0"
