"""Label-sharded mesh DB: 512 objects over 8 virtual devices.

The scale story the reference solves with per-rank object splits
(train_megapose.py:94-112): the padded mesh arrays exceed one device's
modeled budget, so the label axis is sharded over the dp mesh axis and
the train step runs under shard_map with LOCAL label indices. Verifies
(a) each device holds exactly 1/8 of the arrays, (b) per-shard local
indexing round-trips labels, (c) one sharded train step executes with a
finite loss, (d) a label-sharded render selects the right meshes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from megapose6d_tpu.meshes import RigidObject, RigidObjectDataset
from megapose6d_tpu.meshes.io import make_cube
from megapose6d_tpu.meshes.sharded_db import (
    ShardedMeshDB,
    sample_local_batch_indices,
    split_labels,
)
from megapose6d_tpu.parallel.mesh import make_mesh

N_OBJ = 512
N_DEV = 8


def make_objects(n=N_OBJ):
    objs = []
    for i in range(n):
        # Distinct scale per object so selections are distinguishable.
        objs.append(
            RigidObject(
                label=f"obj_{i:04d}", mesh=make_cube(0.01 + 0.0001 * i)
            )
        )
    return RigidObjectDataset(objs)


@pytest.fixture(scope="module")
def sharded():
    mesh = make_mesh(N_DEV)
    db = ShardedMeshDB.build(
        make_objects(),
        n_shards=N_DEV,
        device_mesh=mesh,
        max_faces=16,
        n_points=16,
        n_sym=2,
        align=8,
        n_vertices_pad=32,
        n_faces_pad=16,
    )
    return mesh, db


def test_split_labels_balanced_disjoint():
    labels = [f"l{i}" for i in range(100)]
    shards = split_labels(labels, 8, seed=3)
    assert len(shards) == 8
    unpadded = [list(dict.fromkeys(s)) for s in shards]
    flat = [l for s in unpadded for l in s]
    assert sorted(flat) == sorted(labels)  # disjoint cover
    assert max(len(s) for s in shards) == min(len(s) for s in shards)


def test_device_placement(sharded):
    mesh, db = sharded
    L = db.batched.vertices.shape[0]
    assert L == N_DEV * db.per_shard
    shards = db.batched.vertices.addressable_shards
    assert len(shards) == N_DEV
    # Each device holds exactly 1/N of the label axis — the beyond-HBM
    # memory model: per-device bytes == total/8.
    for s in shards:
        assert s.data.shape[0] == db.per_shard
    devices = {s.device for s in shards}
    assert len(devices) == N_DEV


def test_local_index_roundtrip(sharded):
    _, db = sharded
    for sid in (0, 3, 7):
        labels = db.shard_labels[sid][:4]
        idx = db.local_index(sid, labels)
        base = sid * db.per_shard
        got = [db.batched.labels[base + i] for i in idx]
        assert got == labels


def test_local_shard_slices(sharded):
    _, db = sharded
    sh = db.local_shard(2)
    assert sh.vertices.shape[0] == db.per_shard
    assert len(sh.labels) == db.per_shard


def test_sharded_render_selects_local(sharded):
    """shard_map render: each device renders its own shard's mesh 0."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, db = sharded

    def fn(verts):
        # verts: local [per_shard, V, 3]; take diameters proxy (max norm)
        return jnp.max(jnp.linalg.norm(verts[0], axis=-1))[None]

    out = jax.jit(
        shard_map(
            fn, mesh=mesh, in_specs=(P("dp"),), out_specs=P("dp"),
            check_rep=False,
        )
    )(db.batched.vertices)
    # Each shard's first label is distinct -> distinct cube sizes.
    assert len(np.unique(np.round(np.asarray(out), 6))) > 1


@pytest.mark.slow
def test_sharded_train_step(sharded):
    import dataclasses

    from megapose6d_tpu.models import PosePredictor, PosePredictorConfig
    from megapose6d_tpu.training.config import TrainingConfig, make_refiner_cfg
    from megapose6d_tpu.training.forward_loss import BatchPoseData
    from megapose6d_tpu.training.train import (
        create_train_state,
        make_sharded_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, db = sharded
    res = (16, 32)
    cfg = make_refiner_cfg(
        TrainingConfig(
            batch_size=N_DEV * 2,
            epoch_size=N_DEV * 2,
            input_resize=res,
            render_size=(16, 32),
            n_points_loss=8,
            n_hypotheses=1,
            n_iterations=1,
        )
    )
    cfg = dataclasses.replace(
        cfg, n_rendered_views=1, multiview_type="front_1view"
    )
    model = PosePredictor(
        PosePredictorConfig(**cfg.model_config_kwargs(), face_chunk=16)
    )
    state = create_train_state(cfg, model, db.local_shard(0), jax.random.PRNGKey(0), input_res=res)

    B = N_DEV * 2  # 2 per shard, shard-major
    local_idx = sample_local_batch_indices(db, 2, seed=0).reshape(-1)
    K = np.tile(
        np.asarray([[50.0, 0, 16], [0, 50.0, 8], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    TCO[:, 2, 3] = 0.3
    boxes = np.tile(np.asarray([8, 2, 24, 14], np.float32), (B, 1))
    batch = BatchPoseData(
        rgbs=jnp.zeros((B,) + res + (3,), jnp.float32),
        K=jnp.asarray(K),
        TCO=jnp.asarray(TCO),
        bboxes=jnp.asarray(boxes),
        mesh_idx=jnp.asarray(local_idx),
    )
    sh = NamedSharding(mesh, P("dp"))
    batch = jax.tree.map(lambda a: jax.device_put(a, sh), batch)

    step = make_sharded_train_step(model, cfg, db, mesh)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1), 1)
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["grad_norm"]) > 0
