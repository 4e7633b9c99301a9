"""sap3d_tpu — a TPU-native JAX/Flax/Pallas framework for video saliency detection.

Re-implementation (not a port) of the capabilities of the reference
``A-Nasiri-M/sap3d_tensorflow`` repository: a P3D (Pseudo-3D ResNet-199) 3D-conv
encoder with U-Net / UNet++ / concat decoders and optional self-attention /
non-local / CBAM attention, trained on 16-frame 112x112 clips against per-frame
saliency density maps, plus a host data pipeline, NumPy saliency metrics and
sliding-window inference.

Design stance: idiomatic TPU-first JAX — functional models (flax.linen),
XLA-compiled convolutions, Pallas kernels for the attention hot spots, pjit /
shard_map data-parallelism over a jax.sharding.Mesh, and a host-side
double-buffered input pipeline replacing the reference's tensorpack/ZMQ stack.
"""

__version__ = "0.1.0"

from sap3d_tpu.models.registry import MODEL_REGISTRY, build_model  # noqa: F401
