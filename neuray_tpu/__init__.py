"""neuray_tpu — a TPU-native neural-ray (occlusion-aware IBR) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NeuRay
(CVPR 2022, "Neural Rays for Occlusion-aware Image-based Rendering"):
feed-forward generalizable novel-view synthesis, generalization training
on multi-view dataset mixtures, and per-scene finetuning — built for TPU
hardware (MXU-friendly batched matmuls, channels-last layouts, static
shapes under jit, ray-axis sharding over device meshes).

Layout:
    ops/        pure-jnp + Pallas compute primitives (geometry, sampling,
                interpolation, mixture-of-logistics, compositing, SH)
    models/     Flax modules (encoders, dist decoder, aggregation, renderer)
    data/       host-side numpy data layer (databases, view selection)
    parallel/   mesh / shard_map sharding of the ray axis, DP training
    train/      losses, metrics, LR schedules, trainer loop
    utils/      config system, checkpointing helpers
"""

__version__ = "0.1.0"
