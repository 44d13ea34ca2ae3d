"""megapose6d_tpu — TPU-native render-and-compare 6D pose estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of MegaPose
(megapose6d/megapose6d): coarse SO(3)-grid hypothesis scoring + iterative
DeepIM-style refinement of novel-object poses, with the mesh renderer, crops,
CNN scoring and SE(3) updates all fused into on-device XLA programs and
sharded across chips with `jax.sharding`.
"""

__version__ = "0.1.0"
