"""animnerf_tpu — a TPU-native framework for animatable neural radiance fields.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JanaldoChen/Anim-NeRF (arXiv:2106.13629): given a monocular RGB video with
per-frame masks and SMPL parameters, learn a canonical-space NeRF of the
person, warped per-frame by inverse linear-blend skinning, and use it for
novel-view synthesis, novel-pose animation, shape editing, and mesh
extraction.

Design principles (TPU-first, not a port):
  * pure functional core — no stateful modules; per-frame geometry is an
    explicit ``FrameContext`` pytree threaded through the render functions
  * static shapes everywhere; masked dense compute instead of boolean
    gathers
  * brute-force kNN over the SMPL vertices expressed as an MXU matmul,
    with a Pallas kernel for the fused distance/top-k/blend hot path
  * scale-out via ``jax.sharding.Mesh`` + sharded ray batches (the
    reference's 2048-ray chunk loop and DataParallel are both replaced by
    one sharded program)
"""

__version__ = "0.1.0"
