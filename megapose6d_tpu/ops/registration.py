"""Robust global point-cloud registration (GNC-TLS) + farthest-point
sampling.

TPU-native equivalent of the reference's TEASER++ depth refiner
(megapose6d: src/megapose/inference/teaserpp_refiner.py:53-289). The
reference builds PIXEL-WISE PAIRED point clouds — the rendered depth of
the predicted pose and the measured depth, masked by the same pixels —
and feeds them to the TEASER++ C++ solver (correspondences are given, so
the solver's job is robustness to the outlier pairs caused by depth
noise / occlusion / bad masks). Here the same problem is solved with
graduated non-convexity over a truncated-least-squares cost (GNC-TLS,
the same estimator TEASER++ uses for its rotation stage) around a
weighted Kabsch/Umeyama closed-form step: a fixed-iteration `lax.scan`,
fully jittable, batched with `vmap`.

`sample_farthest_points` replaces pytorch3d's CUDA FPS
(teaserpp_refiner.py:112-114).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


def sample_farthest_points(
    points: Array,  # [N, 3]
    k: int,
    valid: Array | None = None,  # [N] bool
    key: Array | None = None,
) -> Array:
    """Indices [k] of a farthest-point subsample (pytorch3d
    `sample_farthest_points` analog; greedy max-min, fixed trip count)."""
    N = points.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    big = jnp.float32(1e30)
    # Start from the first valid point (or random when key given).
    if key is not None:
        scores = jnp.where(valid, jax.random.uniform(key, (N,)), -1.0)
        first = jnp.argmax(scores)
    else:
        first = jnp.argmax(valid)

    d0 = jnp.where(valid, jnp.sum((points - points[first]) ** 2, -1), -big)

    def body(carry, _):
        dists, last = carry
        nxt = jnp.argmax(dists)
        d_new = jnp.sum((points - points[nxt]) ** 2, -1)
        dists = jnp.minimum(dists, jnp.where(valid, d_new, -big))
        return (dists, nxt), nxt

    (_, _), idx = jax.lax.scan(body, (d0, first), None, length=k - 1)
    return jnp.concatenate([first[None], idx])


def kabsch(
    src: Array,  # [N, 3]
    tgt: Array,  # [N, 3]
    weights: Array,  # [N]
) -> Array:
    """Weighted closed-form rigid alignment `T` (4x4) with
    `T @ src ~= tgt` (Kabsch/Umeyama, SVD on the weighted covariance)."""
    w = weights / jnp.maximum(weights.sum(), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_t = jnp.sum(tgt * w[:, None], axis=0)
    S = (src - mu_s).T @ ((tgt - mu_t) * w[:, None])  # [3, 3]
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.stack(
        [jnp.float32(1.0), jnp.float32(1.0), d]
    ))
    R = Vt.T @ D @ U.T
    t = mu_t - R @ mu_s
    T = jnp.eye(4, dtype=src.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return T


class RegistrationResult(NamedTuple):
    T_tgt_src: Array  # [4, 4]
    inliers: Array  # [N] bool (final TLS weights > 0.5)
    n_inliers: Array  # scalar i32
    valid: Array  # scalar bool (enough valid correspondences)


def gnc_tls_registration(
    src: Array,  # [N, 3]
    tgt: Array,  # [N, 3]
    valid: Array,  # [N] bool putative-correspondence mask
    noise_bound: float = 0.01,
    n_iterations: int = 20,
    gnc_factor: float = 1.4,
    min_points: int = 6,
) -> RegistrationResult:
    """GNC-TLS rigid registration over GIVEN correspondences.

    Truncated-least-squares cost: inlier residuals count quadratically,
    residuals beyond `noise_bound` are capped — solved by graduated
    non-convexity (Yang et al., "Graduated Non-Convexity for Robust
    Spatial Perception"): alternate a weighted Kabsch step with the TLS
    closed-form weight update while annealing mu by `gnc_factor`.
    """
    c2 = jnp.float32(noise_bound) ** 2
    # Invalid slots may hold NaN (e.g. xyz of masked-out depth pixels);
    # kabsch runs with w0 + 1e-9 so they'd still poison the centroid
    # sums (1e-9 * NaN = NaN). Zero them out before any weighted sum.
    finite = jnp.isfinite(src).all(-1) & jnp.isfinite(tgt).all(-1)
    valid = valid & finite
    src = jnp.where(valid[:, None], src, 0.0)
    tgt = jnp.where(valid[:, None], tgt, 0.0)
    w0 = valid.astype(jnp.float32)
    n_valid = w0.sum()

    # Initial fit + mu from the max residual (standard GNC-TLS init).
    T0 = kabsch(src, tgt, w0 + 1e-9)
    r2_0 = jnp.sum(
        (src @ T0[:3, :3].T + T0[:3, 3] - tgt) ** 2, axis=-1
    )
    r2_max = jnp.max(jnp.where(valid, r2_0, 0.0))
    mu0 = c2 / jnp.maximum(2.0 * r2_max - c2, 1e-9)
    mu0 = jnp.maximum(mu0, 1e-4)

    def body(carry, _):
        T, mu = carry
        r2 = jnp.sum((src @ T[:3, :3].T + T[:3, 3] - tgt) ** 2, axis=-1)
        # TLS closed-form weights at this mu.
        lo = (mu / (mu + 1.0)) * c2
        hi = ((mu + 1.0) / mu) * c2
        w_mid = jnp.sqrt(c2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-12)) - mu
        w = jnp.where(r2 <= lo, 1.0, jnp.where(r2 >= hi, 0.0, w_mid))
        w = jnp.clip(w, 0.0, 1.0) * w0
        T = kabsch(src, tgt, w + 1e-9)
        return (T, mu * gnc_factor), None

    (T, _), _ = jax.lax.scan(body, (T0, mu0), None, length=n_iterations)

    r2 = jnp.sum((src @ T[:3, :3].T + T[:3, 3] - tgt) ** 2, axis=-1)
    inliers = valid & (r2 <= c2)
    ok = (n_valid >= min_points) & jnp.isfinite(T).all()
    T = jnp.where(ok, T, jnp.eye(4, dtype=T.dtype))
    return RegistrationResult(
        T_tgt_src=T,
        inliers=inliers,
        n_inliers=inliers.sum().astype(jnp.int32),
        valid=ok,
    )
