import json

import numpy as np
import pytest

from megapose6d_tpu.data.web_scene_dataset import WebSceneDataset
from megapose6d_tpu.meshes import (
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
    make_cube,
    make_uv_sphere,
)


def test_generate_synthetic_dataset(tmp_path):
    from megapose6d_tpu.scripts.generate_synthetic_dataset import generate

    objs = RigidObjectDataset(
        [
            RigidObject(label="cube", mesh=make_cube(0.04)),
            RigidObject(label="sphere", mesh=make_uv_sphere(0.04, 8, 12)),
        ]
    )
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=64, n_sym=2
    ).batched(align=32)
    shards = generate(
        mesh_db, tmp_path / "wds", n_frames=5, resolution=(64, 128),
        n_obj_per_scene=2, f=120.0, frames_per_shard=3,
    )
    assert len(shards) == 2
    ds = WebSceneDataset(tmp_path / "wds", load_depth=True)
    assert len(ds) == 5
    obs = ds[0]
    assert obs.rgb.shape == (64, 128, 3)
    assert obs.rgb.max() > 10  # objects visible
    assert obs.depth.max() > 0.2
    assert (obs.segmentation > 0).sum() > 50
    assert len(obs.object_datas) >= 1
    for od in obs.object_datas:
        assert od.label in ("cube", "sphere")
        assert 0.3 < od.TWO[2, 3] < 1.5
        x1, y1, x2, y2 = od.bbox_modal
        assert 0 <= x1 < x2 <= 128 and 0 <= y1 < y2 <= 64
    # Round-trips through PoseDataset.
    from megapose6d_tpu.data.pose_dataset import PoseDataset

    pose_ds = PoseDataset(
        None, resize=(64, 128), apply_rgb_augmentation=False, min_area=25.0
    )
    data = pose_ds.make_data_from_obs(obs)
    assert data.rgb.shape == (64, 128, 3)


def test_reduce_dict_single_process():
    from megapose6d_tpu.parallel.distributed import (
        gather_collections,
        get_rank,
        get_world_size,
        reduce_dict,
    )

    assert get_world_size() == 1 and get_rank() == 0
    out = reduce_dict({"a": 1.0, "b": 2.0})
    assert out == {"a": 1.0, "b": 2.0}

    import pandas as pd

    from megapose6d_tpu.data.tensor_collection import PandasTensorCollection

    tc = PandasTensorCollection(
        pd.DataFrame({"label": ["x"]}), poses=np.eye(4)[None]
    )
    gathered = gather_collections(tc)
    assert len(gathered) == 1


def test_plot_logs(tmp_path):
    from megapose6d_tpu.utils.plot_logs import load_logs, plot_logs

    run = tmp_path / "run1"
    run.mkdir()
    with open(run / "log.txt", "w") as fh:
        for e in range(3):
            fh.write(
                json.dumps(
                    {"epoch": e + 1, "loss_total": 1.0 / (e + 1),
                     "grad_norm": 0.5}
                )
                + "\n"
            )
    logs = load_logs([run])
    assert len(logs["run1"]) == 3
    plot_logs([run], out_path=tmp_path / "curves.png")
    assert (tmp_path / "curves.png").exists()


def test_resources_and_random():
    from megapose6d_tpu.utils.random import get_unique_seed, seed_everything
    from megapose6d_tpu.utils.resources import (
        device_memory_stats,
        host_memory_rss_mb,
    )

    s1, s2 = get_unique_seed(), get_unique_seed()
    assert s1 != s2
    seed_everything(123)
    a = np.random.rand(3)
    seed_everything(123)
    np.testing.assert_allclose(a, np.random.rand(3))
    stats = device_memory_stats()
    assert "bytes_in_use" in stats
    assert host_memory_rss_mb() > 10

def test_generate_sharded_ranks_and_resume(tmp_path):
    """Rank-split datagen (reference chunk split, generate_shapenet_pbr.py:
    768-840): two ranks write disjoint shards of ONE dataset; re-running
    skips existing shards; frames are identical regardless of the split."""
    from megapose6d_tpu.scripts.generate_synthetic_dataset import generate

    objs = RigidObjectDataset(
        [
            RigidObject(label="cube", mesh=make_cube(0.04)),
            RigidObject(label="sphere", mesh=make_uv_sphere(0.04, 8, 12)),
        ]
    )
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=64, n_sym=2
    ).batched(align=32)
    kw = dict(
        n_frames=6, resolution=(48, 64), n_obj_per_scene=2, f=90.0,
        frames_per_shard=2,
    )
    # Reference single-rank output.
    ref = generate(mesh_db, tmp_path / "ref", **kw)
    assert len(ref) == 3
    # Two ranks into one dir.
    s0 = generate(mesh_db, tmp_path / "multi", rank=0, world_size=2, **kw)
    s1 = generate(mesh_db, tmp_path / "multi", rank=1, world_size=2, **kw)
    assert [p.name for p in s0] == ["shard-000000.tar", "shard-000002.tar"]
    assert [p.name for p in s1] == ["shard-000001.tar"]
    ds = WebSceneDataset(tmp_path / "multi")
    ds_ref = WebSceneDataset(tmp_path / "ref")
    assert len(ds) == len(ds_ref) == 6
    import numpy as np

    for i in (0, 3, 5):
        np.testing.assert_array_equal(ds[i].rgb, ds_ref[i].rgb)
        assert ds[i].infos.view_id == ds_ref[i].infos.view_id == i
    # Resume: re-running rank 0 skips both existing shards (same mtimes).
    mt = {p.name: p.stat().st_mtime_ns for p in s0}
    s0b = generate(mesh_db, tmp_path / "multi", rank=0, world_size=2, **kw)
    assert {p.name: p.stat().st_mtime_ns for p in s0b} == mt


def test_two_process_distributed(tmp_path):
    """Real world_size=2 run of the distributed layer (VERDICT r2 item 5).

    Spawns two OS processes coordinated by jax.distributed (Gloo CPU
    collectives) and checks the gathered predictions equal the
    single-process answer. Reference analog:
    utils/distributed.py:48-154 + scripts/test_distributed.py:38-51.
    """
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    out = tmp_path / "gathered.json"
    worker = Path(__file__).parent / "distributed_worker.py"
    env_base = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            COORDINATOR_ADDRESS=f"localhost:{port}",
            WORLD_SIZE="2",
            RANK=str(rank),
            PYTHONPATH=str(Path(__file__).parent.parent),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = [p.communicate(timeout=180)[0] for p in procs]
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log}"
        assert f"rank {rank}/2 OK" in log

    rec = json.loads(out.read_text())
    # Gathered = all 7 frames in rank order == frame order (np.array_split).
    assert rec["world"] == 2
    assert rec["frame_ids"] == list(range(7))
    assert rec["labels"] == [f"obj_{i}" for i in range(7)]
    np.testing.assert_allclose(rec["scores"], np.arange(7) / 10.0, atol=1e-7)
    np.testing.assert_allclose(rec["pose_diag0"], np.arange(1.0, 8.0))


def test_datagen_shadows_and_ibl():
    """Realism pass: cast shadows only darken (pointwise vs the
    shadowless render) and do darken somewhere; IBL tints ambient
    (BlenderProc-GI capability analog, generate_shapenet_pbr.py)."""
    import jax

    from megapose6d_tpu.meshes.mesh_db import MeshDataBase
    from megapose6d_tpu.scripts.generate_synthetic_dataset import (
        _default_objects,
        make_scene_renderer,
    )

    objs = _default_objects()
    db = MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=128, n_sym=2
    ).batched(align=32)
    kw = dict(ibl=False)
    with_sh = make_scene_renderer(db, 3, (64, 96), 120.0, **kw)
    no_sh = make_scene_renderer(
        db, 3, (64, 96), 120.0, shadows=False, **kw
    )
    found_shadow = False
    for seed in range(4):
        key = jax.random.PRNGKey(seed)
        rgb_s, depth_s, seg_s, *_ = map(np.asarray, with_sh(key))
        rgb_n, depth_n, seg_n, *_ = map(np.asarray, no_sh(key))
        # Geometry identical; only shading differs.
        np.testing.assert_array_equal(seg_s, seg_n)
        np.testing.assert_allclose(depth_s, depth_n, atol=1e-6)
        assert (rgb_s <= rgb_n + 1e-5).all()
        if (rgb_n - rgb_s).max() > 0.05:
            found_shadow = True
    assert found_shadow, "no cast shadow found in 4 random scenes"

    # IBL: ambient becomes normal-direction dependent -> rgb changes vs
    # flat ambient, geometry unchanged.
    with_ibl = make_scene_renderer(db, 3, (64, 96), 120.0, shadows=False)
    rgb_i, _, seg_i, *_ = map(np.asarray, with_ibl(jax.random.PRNGKey(0)))
    rgb_f, _, seg_f, *_ = map(np.asarray, no_sh(jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(seg_i, seg_f)
    assert np.abs(rgb_i - rgb_f).max() > 0.01


def test_datagen_unlit_domain_matched():
    """`unlit=True, background=False` reproduces the training-observation
    domain (synthetic_batch_fn: flat shade=1 unlit albedo on black) —
    the round-4 AR collapse was models trained on that domain meeting
    realism observations (see NEXT.md). Geometry must be identical to
    the realism render; background pixels must be exactly 0; foreground
    must be pure albedo (pointwise >= any lit render of the same scene,
    since shade <= 1 pointwise only holds without IBL gain — compare to
    the flat-ambient arm instead: unlit == albedo means rgb equals the
    ambient=1 composite, i.e. brightest flat shading)."""
    import jax

    from megapose6d_tpu.meshes.mesh_db import MeshDataBase
    from megapose6d_tpu.scripts.generate_synthetic_dataset import (
        _default_objects,
        make_scene_renderer,
    )

    objs = _default_objects()
    db = MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=128, n_sym=2
    ).batched(align=32)
    unlit = make_scene_renderer(
        db, 2, (64, 96), 120.0, background=False, unlit=True
    )
    lit = make_scene_renderer(db, 2, (64, 96), 120.0)
    key = jax.random.PRNGKey(3)
    rgb_u, depth_u, seg_u, *_ = map(np.asarray, unlit(key))
    rgb_l, depth_l, seg_l, *_ = map(np.asarray, lit(key))
    # Same scene geometry regardless of domain.
    np.testing.assert_array_equal(seg_u, seg_l)
    np.testing.assert_allclose(depth_u, depth_l, atol=1e-6)
    # Black background, non-black foreground.
    bg = seg_u == 0
    assert bg.any() and (~bg).any()
    assert np.abs(rgb_u[bg]).max() == 0.0
    assert rgb_u[~bg].max() > 0.05
    # Unlit foreground is flat albedo: invariant across DIFFERENT light
    # draws for the same scene (key_light separates the lighting PRNG
    # from the scene PRNG), while the realism arm must vary with them.
    rgb_u_a, _, seg_u_a, *_ = map(
        np.asarray, unlit(key, jax.random.PRNGKey(50))
    )
    rgb_u_b, *_ = map(np.asarray, unlit(key, jax.random.PRNGKey(51)))
    np.testing.assert_array_equal(seg_u_a, seg_u)  # same scene
    np.testing.assert_allclose(rgb_u_a, rgb_u_b, atol=1e-6)
    rgb_l_a, *_ = map(np.asarray, lit(key, jax.random.PRNGKey(50)))
    rgb_l_b, *_ = map(np.asarray, lit(key, jax.random.PRNGKey(51)))
    assert np.abs(rgb_l_a - rgb_l_b).max() > 1e-3


def test_synthetic_batch_domain_rand():
    """domain_rand=True composites a procedural background and randomizes
    per-sample lighting (the reference's PBR + VOC-background recipe —
    round-4 AR root-cause fix #2, NEXT.md); domain_rand=False stays
    bit-identical to the historical batches (eval sets in committed
    histories depend on the PRNG stream)."""
    import jax

    from megapose6d_tpu.meshes.mesh_db import MeshDataBase
    from megapose6d_tpu.scripts.generate_synthetic_dataset import (
        _default_objects,
    )
    from megapose6d_tpu.training.train import synthetic_batch_fn

    objs = _default_objects()
    db = MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=128, n_sym=2
    ).batched(align=32)
    key = jax.random.PRNGKey(7)
    plain = jax.jit(synthetic_batch_fn(db, 2, (64, 80), f=80.0))(key)
    rand = jax.jit(
        synthetic_batch_fn(db, 2, (64, 80), f=80.0, domain_rand=True)
    )(key)
    # Identical scene geometry (same PRNG stream for pose/mesh draws).
    np.testing.assert_array_equal(
        np.asarray(plain.mesh_idx), np.asarray(rand.mesh_idx)
    )
    np.testing.assert_allclose(
        np.asarray(plain.TCO), np.asarray(rand.TCO), atol=1e-6
    )
    p = np.asarray(plain.rgbs, np.float32)
    r = np.asarray(rand.rgbs, np.float32)
    # Plain batches keep the black background; domain-rand fills it.
    black_px = (p.reshape(2, -1, 3) == 0).all(-1)
    assert black_px.any(), "expected background pixels in the plain batch"
    r_flat = r.reshape(2, -1, 3)
    frac_bg_lit = (r_flat[black_px] > 0.02).any(-1).mean()
    assert frac_bg_lit > 0.5, f"background not composited ({frac_bg_lit})"
    # Lighting differs on the object too (amb<1 or point>0 somewhere).
    fg = ~black_px
    assert np.abs(r_flat[fg] - p.reshape(2, -1, 3)[fg]).max() > 0.01
    # Different keys -> different backgrounds.
    rand2 = jax.jit(
        synthetic_batch_fn(db, 2, (64, 80), f=80.0, domain_rand=True)
    )(jax.random.PRNGKey(8))
    assert np.abs(np.asarray(rand2.rgbs, np.float32) - r).max() > 0.05


def test_synthetic_batch_occlude():
    """occlude=True z-composites a second object over the target while
    keeping the TARGET's GT pose/bbox/mesh_idx and PRNG streams intact
    (occluder draws use fresh fold_in streams) — the reference trains on
    multi-object scenes with occlusion (datasets/pose_dataset.py:108-333);
    single-object training left 2-object occlusion out-of-distribution
    (round-5 AR residual gap)."""
    import jax

    from megapose6d_tpu.meshes.mesh_db import MeshDataBase
    from megapose6d_tpu.scripts.generate_synthetic_dataset import (
        _default_objects,
    )
    from megapose6d_tpu.training.train import synthetic_batch_fn

    objs = _default_objects()
    db = MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=128, n_sym=2
    ).batched(align=32)
    key = jax.random.PRNGKey(11)
    plain = jax.jit(synthetic_batch_fn(db, 4, (64, 80), f=80.0))(key)
    occ = jax.jit(
        synthetic_batch_fn(db, 4, (64, 80), f=80.0, occlude=True)
    )(key)
    # GT labels/poses/boxes are the TARGET object's, unchanged.
    np.testing.assert_array_equal(
        np.asarray(plain.mesh_idx), np.asarray(occ.mesh_idx)
    )
    np.testing.assert_allclose(
        np.asarray(plain.TCO), np.asarray(occ.TCO), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(plain.bboxes), np.asarray(occ.bboxes), atol=1e-6
    )
    # The occluder is strictly closer to the camera, so it must add
    # (not remove) foreground: some pixels change in every sample.
    p = np.asarray(plain.rgbs, np.float32)
    o = np.asarray(occ.rgbs, np.float32)
    changed = (np.abs(o - p).max(-1) > 1e-6).reshape(4, -1).any(-1)
    assert changed.all(), f"occluder absent in samples {np.where(~changed)}"
    # And composition with domain_rand must fill the background behind
    # BOTH objects (fg_mask union).
    both = jax.jit(
        synthetic_batch_fn(
            db, 4, (64, 80), f=80.0, domain_rand=True, occlude=True
        )
    )(key)
    b = np.asarray(both.rgbs, np.float32)
    black_px = (b.reshape(4, -1, 3) == 0).all(-1)
    assert black_px.mean() < 0.1, "background not composited under occlude"
