"""transcar_tpu — a TPU-native camera–radar 3D detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
pangsu0613/TransCAR (Transformer-based Camera-And-Radar fusion 3D object
detection on nuScenes).  The reference is an mmdetection3d plugin built on
CUDA/torch; this framework is designed TPU-first:

* static shapes everywhere (900 queries, 1500 radar tokens, padded GT),
* pure jit-able model functions (radar featurization lives in the input
  pipeline, not inside ``forward``),
* fused Pallas kernels for the hot ops (multi-view bilinear feature
  sampling, masked cross attention),
* ``jax.sharding.Mesh`` + collectives instead of NCCL/DDP,
* optax/orbax/flax for the training loop.

Layering (bottom → top): ``core`` → ``data`` → ``ops`` → ``models`` →
``train``/``eval`` → ``cli``.
"""

__version__ = "0.1.0"
