"""On-device triangle-mesh rasterizer (XLA baseline implementation).

This replaces the reference's out-of-process Panda3D/OpenGL render farm
(megapose6d: src/megapose/panda3d_renderer/panda3d_batch_renderer.py:89-282),
which round-trips CPU scene setup -> OpenGL -> RAM copy -> IPC -> H2D upload
for every hypothesis batch. Here rendering is a pure JAX function: it traces
into the same XLA program as cropping, the CNN and the SE(3) update, so the
refiner loop never leaves the device and is differentiable-adjacent
(gradients are stopped at the render boundary, like the reference's
`TCO_input.detach()`, pose_rigid.py:524).

Algorithm: two-pass z-buffered barycentric rasterization.
  Pass 1 (visibility): scan over static face chunks; for each chunk evaluate
    edge functions for all pixels (fusable elementwise + reduce), keep the
    nearest (max 1/z) face id per pixel.
  Pass 2 (shading): per pixel gather the winning face's vertices, recompute
    barycentrics, perspective-correct-interpolate depth/color/normal.

Conventions (matching the reference renderer's outputs, §2.3 of SURVEY.md):
  - OpenCV intrinsics; pixel (i, j) center at (u=j, v=i).
  - Depth in meters; 0 = background (utils.py:depth_image_from_depth_buffer).
  - Two-sided triangles (panda3d_scene_renderer.py:101 `set_two_sided`).
  - Lighting = ambient 0.1 + six +-axis point lights 0.4 in the *object*
    frame (make_scene_lights, panda3d_scene_renderer.py:104-137, with the
    batch renderer placing the object at the scene origin), which reduces to
    a per-vertex intensity `0.1 + 0.4 * ||n_obj||_1`.
  - Normal channel = eye-space normal mapped to [0,1] via (n+1)/2. (The
    reference's 3D-texture trick wraps negatives instead,
    utils.py:make_rgb_texture_normal_map; we use the standard mapping since
    models are trained with this renderer.)
Outputs are NHWC (TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RenderOutput(NamedTuple):
    rgb: Array  # [B, H, W, 3] in [0, 1]
    normals: Array  # [B, H, W, 3] in [0, 1] (eye-space, (n+1)/2)
    depth: Array  # [B, H, W] meters, 0 = background
    mask: Array  # [B, H, W] bool


def project_to_screen(
    vertices: Array, TCO: Array, K: Array, z_min: float = 1e-3
) -> Array:
    """Object-frame vertices -> screen-space (u, v, z_cam). `[..., V, 3]`."""
    R = TCO[..., :3, :3]
    t = TCO[..., :3, 3]
    v_cam = (
        jnp.einsum(
            "...ij,...nj->...ni", R, vertices,
            precision=jax.lax.Precision.HIGHEST,
        )
        + t[..., None, :]
    )
    z = v_cam[..., 2]
    z_safe = jnp.maximum(z, z_min)
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    u = fx * v_cam[..., 0] / z_safe + cx
    v = fy * v_cam[..., 1] / z_safe + cy
    return jnp.stack([u, v, z], axis=-1)


def _visibility_single(
    screen: Array,  # [V, 3] (u, v, z)
    faces: Array,  # [F, 3] i32
    face_valid: Array,  # [F] bool
    resolution: tuple[int, int],
    chunk: int,
    z_near: float,
) -> tuple[Array, Array]:
    """Pass 1 for one image. Returns (face_id [HW] i32, -1=bg; invz [HW])."""
    H, W = resolution
    HW = H * W
    F = faces.shape[0]
    n_chunks = (F + chunk - 1) // chunk
    F_pad = n_chunks * chunk
    faces = jnp.pad(faces, ((0, F_pad - F), (0, 0)))
    face_valid = jnp.pad(face_valid, (0, F_pad - F))

    px_u = jnp.tile(jnp.arange(W, dtype=screen.dtype), H)  # [HW]
    px_v = jnp.repeat(jnp.arange(H, dtype=screen.dtype), W)

    faces_c = faces.reshape(n_chunks, chunk, 3)
    valid_c = face_valid.reshape(n_chunks, chunk)

    def step(carry, inp):
        best_invz, best_face = carry
        f_idx, f_valid, c_id = inp  # [C, 3], [C], scalar
        tri = screen[f_idx]  # [C, 3, 3]
        u0, v0, z0 = tri[:, 0, 0], tri[:, 0, 1], tri[:, 0, 2]
        u1, v1, z1 = tri[:, 1, 0], tri[:, 1, 1], tri[:, 1, 2]
        u2, v2, z2 = tri[:, 2, 0], tri[:, 2, 1], tri[:, 2, 2]

        # Edge functions E_i(p), with E0+E1+E2 = signed 2*area.
        # E0 = cross(p2-p1, p-p1), etc.
        def edge(ax, ay, bx, by):
            # cross((b-a), (p-a)) for all pixels -> [C, HW]
            return (bx - ax)[:, None] * (px_v[None, :] - ay[:, None]) - (
                by - ay
            )[:, None] * (px_u[None, :] - ax[:, None])

        e0 = edge(u1, v1, u2, v2)
        e1 = edge(u2, v2, u0, v0)
        e2 = edge(u0, v0, u1, v1)
        t1 = (u1 - u0) * (v2 - v0)
        t2 = (v1 - v0) * (u2 - u0)
        area = t1 - t2  # [C]
        # Scale-aware degeneracy cull: FMA noise on the cross product can
        # reach ~1e-4 px^2 for zero-area faces at 100px coordinates, so an
        # absolute 1e-9 threshold lets garbage half-plane wedges through.
        area_ok = jnp.abs(area) > 1e-5 * (jnp.abs(t1) + jnp.abs(t2) + 1e-9)

        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        inside = jnp.where(area[:, None] >= 0, pos, neg)

        inv_area = jnp.where(area_ok, 1.0 / area, 0.0)[:, None]
        l0 = e0 * inv_area
        l1 = e1 * inv_area
        l2 = 1.0 - l0 - l1
        invz = (
            l0 / z0[:, None] + l1 / z1[:, None] + l2 / z2[:, None]
        )  # [C, HW]

        ok = (
            inside
            & area_ok[:, None]
            & f_valid[:, None]
            & (jnp.minimum(jnp.minimum(z0, z1), z2) > z_near)[:, None]
        )
        invz = jnp.where(ok, invz, -jnp.inf)
        c_best = jnp.max(invz, axis=0)  # [HW]
        c_arg = jnp.argmax(invz, axis=0).astype(jnp.int32) + c_id * chunk

        better = c_best > best_invz
        return (
            jnp.where(better, c_best, best_invz),
            jnp.where(better, c_arg, best_face),
        ), None

    init = (
        jnp.full((HW,), -jnp.inf, screen.dtype),
        jnp.full((HW,), -1, jnp.int32),
    )
    (invz, face_id), _ = jax.lax.scan(
        step, init, (faces_c, valid_c, jnp.arange(n_chunks))
    )
    return face_id, invz


def sample_textures_bilinear(
    textures: Array,  # [B, TS, TS, 3] uint8
    uv: Array,  # [B, H, W, 2] in [0, 1] (image convention: u right, v down)
) -> Array:
    """Per-image bilinear texture lookup -> [B, H, W, 3] float in [0, 1].

    The per-pixel texture gather runs in XLA (phase C), NOT in the raster
    kernel: Mosaic has no efficient per-pixel gather, while each rendered
    image samples exactly ONE object's texture so the lookup is a plain
    per-image table gather. Replaces the reference's Panda3D texture
    mapping (panda3d_scene_renderer.py:298-358)."""
    B, TS = textures.shape[0], textures.shape[1]
    H, W = uv.shape[1], uv.shape[2]
    x = jnp.clip(uv[..., 0] * TS - 0.5, 0.0, TS - 1.0)
    y = jnp.clip(uv[..., 1] * TS - 0.5, 0.0, TS - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, TS - 1)
    y1 = jnp.minimum(y0 + 1, TS - 1)
    fx = (x - x0.astype(x.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]

    flat = textures.reshape(B, TS * TS, 3).astype(jnp.float32) / 255.0

    def g(tex_flat, yy, xx):
        return jnp.take(tex_flat, yy * TS + xx, axis=0)

    gather = jax.vmap(
        lambda tf, yy, xx: g(tf, yy.reshape(-1), xx.reshape(-1)).reshape(
            H, W, 3
        )
    )
    c00 = gather(flat, y0, x0)
    c01 = gather(flat, y0, x1)
    c10 = gather(flat, y1, x0)
    c11 = gather(flat, y1, x1)
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def apply_uv_as_colors(
    colors: Array,  # [B, V, 3]
    uvs: Array | None,  # [B, V, 2]
    has_tex: Array | None,  # [B]
) -> Array:
    """For textured meshes, carry (u, v, 0) in the color attribute slots —
    each rendered image is one object, so the slot interpretation can
    switch per image with zero extra rasterization cost."""
    if uvs is None or has_tex is None:
        return colors
    uv3 = jnp.concatenate([uvs, jnp.zeros_like(uvs[..., :1])], axis=-1)
    return jnp.where(has_tex[:, None, None], uv3, colors)


def _shade_single(
    screen: Array,  # [V, 3]
    v_normals_obj: Array,  # [V, 3]
    v_colors: Array,  # [V, 3]
    faces: Array,  # [F, 3]
    R_co: Array,  # [3, 3] rotation camera<-object
    face_id: Array,  # [HW]
    resolution: tuple[int, int],
    light_ambient: float,
    light_point: float,
    raw_albedo: bool = False,
) -> tuple[Array, Array, Array, Array]:
    H, W = resolution
    HW = H * W
    hit = face_id >= 0
    fid = jnp.maximum(face_id, 0)
    vidx = faces[fid]  # [HW, 3]
    tri = screen[vidx]  # [HW, 3, 3]

    px_u = jnp.tile(jnp.arange(W, dtype=screen.dtype), H)
    px_v = jnp.repeat(jnp.arange(H, dtype=screen.dtype), W)

    u = tri[..., 0]  # [HW, 3]
    v = tri[..., 1]
    z = tri[..., 2]
    # Screen-space barycentrics at pixel centers.
    e0 = (u[:, 2] - u[:, 1]) * (px_v - v[:, 1]) - (v[:, 2] - v[:, 1]) * (
        px_u - u[:, 1]
    )
    e1 = (u[:, 0] - u[:, 2]) * (px_v - v[:, 2]) - (v[:, 0] - v[:, 2]) * (
        px_u - u[:, 2]
    )
    area = (u[:, 1] - u[:, 0]) * (v[:, 2] - v[:, 0]) - (
        v[:, 1] - v[:, 0]
    ) * (u[:, 2] - u[:, 0])
    inv_area = jnp.where(jnp.abs(area) > 1e-9, 1.0 / area, 0.0)
    l0 = e0 * inv_area
    l1 = e1 * inv_area
    l2 = 1.0 - l0 - l1
    lam = jnp.stack([l0, l1, l2], -1)  # [HW, 3]

    invz_per_v = 1.0 / jnp.maximum(z, 1e-6)
    invz = jnp.sum(lam * invz_per_v, -1)
    depth = jnp.where(hit, 1.0 / jnp.maximum(invz, 1e-6), 0.0)
    # Perspective-correct attribute weights.
    wgt = lam * invz_per_v / jnp.maximum(invz, 1e-6)[:, None]  # [HW, 3]

    n_obj = jnp.sum(v_normals_obj[vidx] * wgt[..., None], axis=1)  # [HW, 3]
    n_obj = n_obj / jnp.maximum(
        jnp.linalg.norm(n_obj, axis=-1, keepdims=True), 1e-9
    )
    albedo = jnp.sum(v_colors[vidx] * wgt[..., None], axis=1)

    # Object-frame axis lights: intensity = ambient + point * ||n||_1.
    intensity = light_ambient + light_point * jnp.sum(jnp.abs(n_obj), -1)

    n_eye = jnp.einsum(
        "ij,nj->ni", R_co, n_obj, precision=jax.lax.Precision.HIGHEST
    )
    normals_img = jnp.where(hit[:, None], (n_eye + 1.0) * 0.5, 0.0)

    if raw_albedo:
        # Texture path: defer lighting to the caller (rgb slot carries
        # (albedo payload, intensity) so the texture lookup can replace
        # the albedo first).
        payload = jnp.where(hit[:, None], albedo, 0.0)
        rgb_out = (
            payload.reshape(H, W, 3),
            intensity.reshape(H, W),
        )
    else:
        rgb = jnp.clip(albedo * intensity[:, None], 0.0, 1.0)
        rgb = jnp.where(hit[:, None], rgb, 0.0)
        rgb_out = rgb.reshape(H, W, 3)

    return (
        rgb_out,
        normals_img.reshape(H, W, 3),
        depth.reshape(H, W),
        hit.reshape(H, W),
    )


def render_meshes(
    vertices: Array,  # [B, V, 3] object frame
    normals: Array,  # [B, V, 3]
    colors: Array,  # [B, V, 3]
    faces: Array,  # [B, F, 3] i32
    face_valid: Array,  # [B, F] bool
    TCO: Array,  # [B, 4, 4]
    K: Array,  # [B, 3, 3]
    resolution: tuple[int, int],
    z_near: float = 0.01,
    chunk: int = 64,
    light_ambient: float | Array = 0.1,
    light_point: float | Array = 0.4,
    uvs: Array | None = None,
    textures: Array | None = None,
    has_tex: Array | None = None,
) -> RenderOutput:
    """Render a batch of (mesh, pose) hypotheses. All args static-shaped.

    Pass `uvs [B, V, 2]` + `textures [B, TS, TS, 3] u8` + `has_tex [B]`
    for per-pixel texture sampling (phase-C bilinear lookup); textured
    images then ignore `colors`.

    `light_ambient`/`light_point` may be scalars or per-batch `[B]` arrays
    (per-sample randomized ambient light is a training augmentation,
    pose_rigid.py:render_images_multiview:384-396).

    Non-finite poses render empty (the reference zero-fills those too,
    panda3d_batch_renderer.py:109-135).
    """
    B = TCO.shape[0]
    finite = jnp.isfinite(TCO).all(axis=(-1, -2))  # [B]
    TCO = jnp.where(finite[..., None, None], TCO, jnp.eye(4, dtype=TCO.dtype))
    screen = project_to_screen(vertices, TCO, K)
    face_valid = face_valid & finite[..., None]
    amb = jnp.broadcast_to(jnp.asarray(light_ambient, screen.dtype), (B,))
    pnt = jnp.broadcast_to(jnp.asarray(light_point, screen.dtype), (B,))
    textured = textures is not None and uvs is not None and has_tex is not None
    colors_eff = apply_uv_as_colors(colors, uvs, has_tex) if textured else colors

    def one(screen_b, faces_b, fvalid_b, n_b, c_b, R_b, amb_b, pnt_b):
        face_id, _ = _visibility_single(
            screen_b, faces_b, fvalid_b, resolution, chunk, z_near
        )
        return _shade_single(
            screen_b, n_b, c_b, faces_b, R_b, face_id, resolution,
            amb_b, pnt_b, raw_albedo=textured,
        )

    rgb, nrm, depth, mask = jax.vmap(one)(
        screen, faces, face_valid, normals, colors_eff, TCO[..., :3, :3],
        amb, pnt,
    )
    if textured:
        # rgb currently holds (albedo-or-uv, intensity-deferred) payload:
        # channels 0:2 = interpolated uv for textured images, 0:3 =
        # albedo for untextured; channel 3 would be intensity, which
        # _shade_single folds by returning intensity in `nrm` alpha — see
        # raw_albedo contract below.
        payload, intensity = rgb
        tex_rgb = sample_textures_bilinear(
            textures, jnp.clip(payload[..., 0:2], 0.0, 1.0)
        )
        albedo = jnp.where(
            has_tex[:, None, None, None], tex_rgb, payload
        )
        rgb = jnp.clip(albedo * intensity[..., None], 0.0, 1.0)
        rgb = jnp.where(mask[..., None], rgb, 0.0)
    return RenderOutput(rgb=rgb, normals=nrm, depth=depth, mask=mask)


def render_batched_meshes(
    meshes, TCO: Array, K: Array, resolution: tuple[int, int], **kw
) -> RenderOutput:
    """Convenience wrapper over a selected `BatchedMeshes` batch."""
    return render_meshes(
        meshes.vertices,
        meshes.normals,
        meshes.colors,
        meshes.faces,
        meshes.face_valid,
        TCO,
        K,
        resolution,
        **kw,
    )
