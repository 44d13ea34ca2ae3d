"""Full-f32 matmul helpers for pose geometry.

On TPU, `jnp.matmul`/`einsum` default to MXU bf16 inputs; fine for the CNN,
NOT fine for SE(3) chains and pixel projections (sub-pixel accuracy needed).
These tiny 3x3/4x4 contractions are negligible FLOPs, so pin them to
`Precision.HIGHEST`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
matmul = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
