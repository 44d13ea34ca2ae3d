"""TPU-native synthetic dataset generation.

The reference generates its 2M-image training set by driving BlenderProc
(CPU/GPU raytracing) in per-chunk subprocesses
(megapose6d: src/megapose/scripts/generate_shapenet_pbr.py:768-840). The
TPU-native counterpart renders multi-object scenes with the on-device
rasterizer — orders of magnitude faster per frame — and writes the same
webdataset shard format the training pipeline reads
(data/web_scene_dataset.py). Chunk-resumable like the reference (existing
shards are skipped).

Usage:
    python -m megapose6d_tpu.scripts.generate_synthetic_dataset \\
        out_dir=local_data/webdatasets/synth n_frames=10000 \\
        [object_dataset=ycbv] [resolution=480,640] [n_obj_per_scene=3]
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.scene_dataset import ObservationInfos, SceneObservation
from ..data.types import CameraData, ObjectData
from ..data.web_scene_dataset import write_scene_ds_as_wds
from ..meshes.mesh_db import MeshDataBase
from ..ops import rasterizer_tiled
from ..ops.camera import look_at_R
from ..ops.se3 import invert_se3, make_se3, rotmat_from_quat
from ..ops.so3_grid import super_fibonacci_quats
from ..utils.logging import get_logger

logger = get_logger(__name__)


def _random_background(key, resolution):
    """Procedural cluttered background: a low-frequency random color field
    upsampled (the PBR-realism analog of the reference's BlenderProc room
    textures / VOC background augmentation, generate_shapenet_pbr.py +
    augmentations VOCBackgroundAugmentation)."""
    H, W = resolution
    k1, k2, k3 = jax.random.split(key, 3)
    coarse = jax.random.uniform(k1, (6, 8, 3), minval=0.0, maxval=1.0)
    fine = jax.random.uniform(k2, (24, 32, 3), minval=-0.15, maxval=0.15)
    bg = jax.image.resize(coarse, (H, W, 3), "linear") + jax.image.resize(
        fine, (H, W, 3), "linear"
    )
    gain = jax.random.uniform(k3, (), minval=0.4, maxval=1.0)
    return jnp.clip(bg * gain, 0.0, 1.0)


def _env_sample(c0, c1, n):
    """Degree-1 spherical-harmonic-style environment lighting: color =
    c0 + n @ c1, clipped. `n` is an eye-space normal [..., 3]."""
    return jnp.clip(
        c0 + jnp.einsum("...j,jc->...c", n, c1), 0.0, 2.0
    )


def make_scene_renderer(
    mesh_db,
    n_obj: int,
    resolution,
    f: float,
    background: bool = True,
    shadows: bool = True,
    ibl: bool = True,
    unlit: bool = False,
):
    """Jitted multi-object scene render: per-object renders + deferred
    z-composite shading over a procedural background.

    Realism model (narrowing the gap to the reference's BlenderProc
    ray-traced GI, generate_shapenet_pbr.py:768-840, without a path
    tracer):
      - `shadows=True`: a second rasterizer pass from a randomly-placed
        point light builds a shadow map (min-depth composite over
        objects); the main view's pixels (foreground AND the background
        plane) are reprojected into light space and depth-tested, so
        objects cast shadows on each other and on the backdrop.
      - `ibl=True`: ambient light becomes a low-order directional
        environment tied to the background palette (degree-1 SH sampled
        by eye-space normal), coupling object tint to the scene the way
        GI bleeds background color onto objects.
      - `unlit=True`: the DOMAIN-MATCHED mode — flat shade=1 unlit
        albedo, no point light / shadows / IBL, exactly the observation
        statistics of the demo training batches (`synthetic_batch_fn`:
        light_ambient=1.0, light_point=0.0). Use with background=False
        to evaluate models trained on those batches (the round-4 AR
        collapse was this domain gap — see NEXT.md).

    Returns fn(key) -> (rgb [H,W,3], depth, seg [H,W] i32, TCO [n_obj,4,4],
    mesh_idx [n_obj], K [3,3], visib [n_obj])."""
    if unlit:
        shadows = False
        ibl = False
    H, W = resolution
    K1 = jnp.asarray(
        [[f, 0.0, W / 2 - 0.5], [0.0, f, H / 2 - 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    quat_pool = jnp.asarray(super_fibonacci_quats(4096), jnp.float32)

    tex_kw = {}
    if (
        mesh_db.textures is not None
        and mesh_db.uvs is not None
        and mesh_db.has_tex is not None
    ):
        tex_kw = dict(textured=True)

    # Pixel-center rays for deferred shading / shadow reprojection.
    uu, vv = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32)
    )
    rays = jnp.stack(
        [(uu - K1[0, 2]) / K1[0, 0], (vv - K1[1, 2]) / K1[1, 1]], -1
    )  # [H, W, 2]; X_c = depth * (rays, 1)
    f_light = 1.1 * max(H, W)
    K_light = jnp.asarray(
        [
            [f_light, 0.0, W / 2 - 0.5],
            [0.0, f_light, H / 2 - 0.5],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    z_bg = 1.45  # background plane depth (behind the farthest object)

    def fn(key, key_light=None):
        # `key_light`: optional separate PRNG for the LIGHTING draws
        # (ambient/point intensities + light position) so scene geometry
        # and lighting are independently controllable — used by the
        # unlit-invariance test (same scene, different light draws) and
        # lighting-ablation sweeps. Default None keeps the historical
        # single-key stream bit-identical (committed datasets depend on
        # it).
        k1, k2, k3, k4, k5, k6, k7, k8, k9 = jax.random.split(key, 9)
        if key_light is not None:
            k5, k6, k8, k9 = jax.random.split(key_light, 4)
        L = mesh_db.n_labels
        mesh_idx = jax.random.randint(k1, (n_obj,), 0, L)
        q = quat_pool[jax.random.randint(k2, (n_obj,), 0, len(quat_pool))]
        R = rotmat_from_quat(q)
        z = jax.random.uniform(k3, (n_obj, 1), minval=0.5, maxval=1.2)
        xy = jax.random.uniform(k4, (n_obj, 2), minval=-0.12, maxval=0.12)
        TCO = make_se3(R, jnp.concatenate([xy * z, z], -1))
        meshes = mesh_db.select(mesh_idx)
        K = jnp.broadcast_to(K1, (n_obj, 3, 3))
        amb = jax.random.uniform(k5, (), minval=0.5, maxval=0.9)
        pnt = jax.random.uniform(k6, (), minval=0.25, maxval=0.65)
        mesh_tex_kw = (
            dict(
                uvs=meshes.uvs,
                textures=meshes.textures,
                has_tex=meshes.has_tex,
            )
            if tex_kw
            else {}
        )
        interpret = jax.default_backend() == "cpu"
        # Main pass: unlit albedo (ambient=1, point=0) + normals + depth;
        # lighting is applied in the deferred composite below.
        out = rasterizer_tiled.render_meshes_tiled(
            meshes.vertices, meshes.normals, meshes.colors, meshes.faces,
            meshes.face_valid, TCO, K, (H, W),
            light_ambient=1.0, light_point=0.0,
            interpret=interpret,
            **mesh_tex_kw,
        )
        # z-composite the n_obj layers.
        depth_l = jnp.where(out.mask, out.depth, jnp.inf)  # [n, H, W]
        winner = jnp.argmin(depth_l, axis=0)  # [H, W]
        any_hit = out.mask.any(axis=0)
        take = lambda a: jnp.take_along_axis(
            a, winner[None, ..., None] if a.ndim == 4 else winner[None],
            axis=0,
        )[0]
        albedo = take(out.rgb)
        n_eye = take(out.normals) * 2.0 - 1.0  # decode eye-space normals
        depth = jnp.where(any_hit, take(out.depth), 0.0)
        seg = jnp.where(any_hit, winner + 1, 0).astype(jnp.int32)

        if background:
            bg = _random_background(k7, resolution)
        else:
            bg = jnp.zeros((H, W, 3), albedo.dtype)

        # ---- lighting ------------------------------------------------
        # Point light above the scene (camera frame: -y is up).
        lx = jax.random.uniform(k8, (), minval=-1.0, maxval=1.0)
        lz = jax.random.uniform(k9, (), minval=-0.4, maxval=0.9)
        light_pos = jnp.stack([lx, -1.2, 0.85 + lz])
        target = jnp.asarray([0.0, 0.0, 0.85])

        if ibl:
            coarse = jax.random.uniform(
                jax.random.fold_in(k7, 1), (3, 3), minval=-0.3, maxval=0.3
            )
            c0 = (
                bg.mean((0, 1)) * 0.7 + 0.3
                if background
                else jnp.ones((3,))
            )
            env = lambda n: 0.35 + 0.65 * _env_sample(c0, coarse * c0, n)
        else:
            env = lambda n: jnp.ones_like(n)

        # Shading points: object surface for hits, the background plane
        # (normal -z, facing the camera) elsewhere.
        pix_depth = jnp.where(any_hit, depth, z_bg)
        X_c = jnp.concatenate(
            [rays * pix_depth[..., None], pix_depth[..., None]], -1
        )  # [H, W, 3]
        n_pix = jnp.where(
            any_hit[..., None], n_eye, jnp.asarray([0.0, 0.0, -1.0])
        )
        l_dir = light_pos - X_c
        l_dir = l_dir / jnp.maximum(
            jnp.linalg.norm(l_dir, axis=-1, keepdims=True), 1e-6
        )
        n_dot_l = jnp.clip(jnp.sum(n_pix * l_dir, -1), 0.0, 1.0)

        if shadows:
            # Shadow map: depth from the light's viewpoint, min-composited
            # over all objects (second rasterizer pass; the TPU-side
            # equivalent of BlenderProc's shadow rays).
            up = jnp.asarray([0.0, -1.0, 0.0])
            R_CL = look_at_R(light_pos, target, up)  # light cam -> camera
            T_CL = make_se3(R_CL, light_pos)
            T_LC = invert_se3(T_CL)
            TLO = jnp.einsum("ij,njk->nik", T_LC, TCO)
            K_L = jnp.broadcast_to(K_light, (n_obj, 3, 3))
            out_l = rasterizer_tiled.render_meshes_tiled(
                meshes.vertices, meshes.normals, meshes.colors,
                meshes.faces, meshes.face_valid, TLO, K_L, (H, W),
                light_ambient=1.0, light_point=0.0,
                interpret=interpret,
            )
            shadow_depth = jnp.where(
                out_l.mask, out_l.depth, jnp.inf
            ).min(axis=0)  # [H, W]
            # Reproject shading points into light space + depth test.
            X_l = (
                jnp.einsum("ij,hwj->hwi", T_LC[:3, :3], X_c)
                + T_LC[:3, 3]
            )
            zl = jnp.maximum(X_l[..., 2], 1e-4)
            ul = K_light[0, 0] * X_l[..., 0] / zl + K_light[0, 2]
            vl = K_light[1, 1] * X_l[..., 1] / zl + K_light[1, 2]
            iu = jnp.clip(jnp.round(ul).astype(jnp.int32), 0, W - 1)
            iv = jnp.clip(jnp.round(vl).astype(jnp.int32), 0, H - 1)
            d_map = shadow_depth[iv, iu]
            in_map = (ul >= 0) & (ul <= W - 1) & (vl >= 0) & (vl <= H - 1)
            bias = 5e-3 + 3e-2 * (1.0 - n_dot_l)
            lit = jnp.where(
                in_map & jnp.isfinite(d_map), zl <= d_map + bias, True
            ).astype(jnp.float32)
            # soften: average with the 4-neighborhood test at +-1px
            lit = 0.5 * lit + 0.5 * jnp.where(
                in_map & jnp.isfinite(d_map),
                (zl <= shadow_depth[
                    jnp.clip(iv + 1, 0, H - 1), iu
                ] + bias).astype(jnp.float32),
                1.0,
            )
        else:
            lit = jnp.ones((H, W), jnp.float32)

        if unlit:
            shade = jnp.ones((H, W, 1), jnp.float32)
        else:
            shade = amb * env(n_pix) + pnt * (n_dot_l * lit)[..., None]
        fg_rgb = jnp.clip(albedo * shade, 0.0, 1.0)
        bg_rgb = jnp.clip(bg * shade, 0.0, 1.0)
        rgb = jnp.where(any_hit[..., None], fg_rgb, bg_rgb)
        # Visible fraction per object: visible px / unoccluded-layer px
        # (the reference gets visib_fract from BlenderProc/BOP gt_info).
        layer_px = out.mask.sum(axis=(1, 2))  # [n]
        vis_px = (
            (winner[None] == jnp.arange(n_obj)[:, None, None]) & any_hit[None]
        ).sum(axis=(1, 2))
        visib = vis_px / jnp.maximum(layer_px, 1)
        return rgb, depth, seg, TCO, mesh_idx, K1, visib

    return jax.jit(fn)


def generate(
    mesh_db,
    out_dir: str | Path,
    n_frames: int,
    resolution=(480, 640),
    n_obj_per_scene: int = 3,
    f: float = 600.0,
    frames_per_shard: int = 1000,
    seed: int = 0,
    rank: int = 0,
    world_size: int = 1,
):
    """Render `n_frames` frames into webdataset shards.

    Shard-level parallel + resumable, like the reference's chunked
    BlenderProc datagen (generate_shapenet_pbr.py:768-840: chunk ids
    np.array_split across ranks, only missing chunks re-rendered): shard
    `s` covers frames `[s*fps, (s+1)*fps)` deterministically (frame i's
    PRNG key is fold_in(seed, i)), rank r renders shards r, r+W, r+2W...,
    and shards whose .tar already exists are skipped."""
    out_dir = Path(out_dir)
    render = make_scene_renderer(mesh_db, n_obj_per_scene, resolution, f)
    labels = mesh_db.labels
    fps = frames_per_shard
    n_shards_total = (n_frames + fps - 1) // fps
    base_key = jax.random.PRNGKey(seed)

    def observations(frames):
        for i in frames:
            sub = jax.random.fold_in(base_key, i)
            rgb, depth, seg, TCO, mesh_idx, K, visib = render(sub)
            rgb8 = np.asarray(
                jnp.clip(rgb * 255, 0, 255).astype(jnp.uint8)
            )
            seg_np = np.asarray(seg).astype(np.uint32)
            object_datas = []
            for n in range(n_obj_per_scene):
                ys, xs = np.nonzero(seg_np == n + 1)
                if len(ys) < 16:
                    continue
                object_datas.append(
                    ObjectData(
                        label=labels[int(mesh_idx[n])],
                        TWO=np.asarray(TCO[n], np.float64),
                        unique_id=n + 1,
                        bbox_modal=np.asarray(
                            [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                            np.float64,
                        ),
                        visib_fract=float(visib[n]),
                    )
                )
            yield SceneObservation(
                rgb=rgb8,
                depth=np.asarray(depth, np.float32),
                segmentation=seg_np,
                infos=ObservationInfos(scene_id=str(i // 100), view_id=i),
                object_datas=object_datas,
                camera_data=CameraData(
                    K=np.asarray(K, np.float64), resolution=resolution
                ),
            )
            if (i + 1) % 500 == 0:
                logger.info(f"rendered {i + 1}/{n_frames} frames")

    shards: list[Path] = []
    shard_fmt = "shard-{:06d}.tar"
    for s in range(rank, n_shards_total, world_size):
        path = out_dir / shard_fmt.format(s)
        if path.exists():
            logger.info(f"shard {path.name} exists, skipping")
            shards.append(path)
            continue
        frames = range(s * fps, min((s + 1) * fps, n_frames))
        shards += write_scene_ds_as_wds(
            observations(frames),
            out_dir,
            frames_per_shard=len(frames),
            shard_offset=s,
            frame_id_offset=frames.start,
        )
    logger.info(
        f"rank {rank}/{world_size}: {len(shards)} shards in {out_dir}"
    )
    return shards


def generate_bop(
    mesh_db,
    objects,
    ds_dir: str | Path,
    n_frames: int,
    resolution=(480, 640),
    n_obj_per_scene: int = 3,
    f: float = 600.0,
    frames_per_scene: int = 100,
    seed: int = 0,
    split: str = "test",
    write_models: bool = True,
    background: bool = True,
    shadows: bool = True,
    ibl: bool = True,
    unlit: bool = False,
) -> Path:
    """BOP-layout variant of `generate` (data/bop_writer.py): the output
    feeds BOPDataset -> run_eval -> BOPScoreMeter / bop_toolkit directly.

    `background/shadows/ibl/unlit` select the observation domain (see
    make_scene_renderer): realism defaults, or `unlit=True,
    background=False` for datasets domain-matched to models trained on
    `synthetic_batch_fn` observations."""
    from ..data.bop_writer import write_bop_models, write_scene_ds_as_bop
    from ..evaluation.bop import label_to_obj_id

    ds_dir = Path(ds_dir)
    render = make_scene_renderer(
        mesh_db, n_obj_per_scene, resolution, f,
        background=background, shadows=shadows, ibl=ibl, unlit=unlit,
    )
    labels = mesh_db.labels

    if write_models:
        write_bop_models(
            (
                (label_to_obj_id(obj.label), obj.load())
                for obj in objects.objects
            ),
            ds_dir / "models",
        )

    def observations():
        key = jax.random.PRNGKey(seed)
        for i in range(n_frames):
            key, sub = jax.random.split(key)
            rgb, depth, seg, TCO, mesh_idx, K, visib = render(sub)
            rgb8 = np.asarray(jnp.clip(rgb * 255, 0, 255).astype(jnp.uint8))
            seg_np = np.asarray(seg).astype(np.uint32)
            object_datas = []
            for n in range(n_obj_per_scene):
                if (seg_np == n + 1).sum() < 16:
                    continue
                object_datas.append(
                    ObjectData(
                        label=labels[int(mesh_idx[n])],
                        TWO=np.asarray(TCO[n], np.float64),
                        unique_id=n + 1,
                        visib_fract=float(visib[n]),
                    )
                )
            yield SceneObservation(
                rgb=rgb8,
                depth=np.asarray(depth, np.float32),
                segmentation=seg_np,
                infos=ObservationInfos(
                    scene_id=str(i // frames_per_scene), view_id=i
                ),
                object_datas=object_datas,
                camera_data=CameraData(
                    K=np.asarray(K, np.float64), resolution=resolution
                ),
            )
            if (i + 1) % 500 == 0:
                logger.info(f"rendered {i + 1}/{n_frames} frames")

    out = write_scene_ds_as_bop(observations(), ds_dir, split=split)
    logger.info(f"wrote BOP split {out}")
    return out


def _default_objects():
    """Procedural TEXTURED objects with BOP-convention labels
    (obj_000001...): random-block textures give the render-and-compare
    models the high-frequency appearance cues real BOP/GSO assets have."""
    from ..meshes.io import make_cube, make_cylinder, make_uv_sphere
    from ..meshes.mesh_db import RigidObject, RigidObjectDataset

    return RigidObjectDataset(
        [
            RigidObject(
                label="obj_000001",
                mesh=make_cube(0.04, textured=True, seed=11),
            ),
            RigidObject(
                label="obj_000002",
                mesh=make_uv_sphere(0.04, 24, 32, textured=True, seed=12),
            ),
            RigidObject(
                label="obj_000003",
                mesh=make_cylinder(0.025, 0.09, n_seg=32),
            ),
            RigidObject(
                label="obj_000004",
                mesh=make_uv_sphere(0.03, 20, 28, textured=True, seed=13),
            ),
        ]
    )


def main(argv=None):
    args = dict(
        out_dir="synth_wds",
        n_frames="1000",
        object_dataset="",
        resolution="480,640",
        n_obj_per_scene="3",
        frames_per_shard="1000",
        seed="0",
        format="wds",
        split="test",
        rank="0",
        world_size="1",
    )
    for a in sys.argv[1:] if argv is None else argv:
        k, _, v = a.partition("=")
        assert k in args, f"unknown arg {k}"
        args[k] = v

    if args["object_dataset"]:
        from ..data.datasets_cfg import make_object_dataset

        objects = make_object_dataset(args["object_dataset"])
        write_models = False  # source BOP dataset already ships models/
    else:
        objects = _default_objects()
        write_models = True
    mesh_db = MeshDataBase.from_object_ds(objects).batched()
    res = tuple(int(x) for x in args["resolution"].split(","))
    if args["format"] == "bop":
        generate_bop(
            mesh_db,
            objects,
            args["out_dir"],
            int(args["n_frames"]),
            resolution=res,
            n_obj_per_scene=int(args["n_obj_per_scene"]),
            seed=int(args["seed"]),
            split=args["split"],
            write_models=write_models,
        )
    else:
        generate(
            mesh_db,
            args["out_dir"],
            int(args["n_frames"]),
            resolution=res,
            n_obj_per_scene=int(args["n_obj_per_scene"]),
            frames_per_shard=int(args["frames_per_shard"]),
            seed=int(args["seed"]),
            rank=int(args["rank"]),
            world_size=int(args["world_size"]),
        )


if __name__ == "__main__":
    main()
