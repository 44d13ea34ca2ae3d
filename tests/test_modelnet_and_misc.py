import json
import pickle

import numpy as np
import pytest

from megapose6d_tpu.data.modelnet import (
    DeepImModelNetDataset,
    PickleSceneDataset,
)
from megapose6d_tpu.data.scene_dataset import ObservationInfos, SceneObservation
from megapose6d_tpu.data.types import CameraData


@pytest.fixture
def modelnet_root(tmp_path):
    from PIL import Image

    cat = tmp_path / "chair"
    (cat / "test").mkdir(parents=True)
    K = [[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]]
    (cat / "camera.json").write_text(
        json.dumps({"K": K, "resolution": [96, 128]})
    )
    rng = np.random.RandomState(0)
    for model, view in (("chair_0001", 0), ("chair_0001", 1)):
        key = f"{model}_{view}"
        Image.fromarray(
            rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
        ).save(cat / "test" / f"{key}-color.png")
        Image.fromarray(
            np.full((96, 128), 800, np.uint16)
        ).save(cat / "test" / f"{key}-depth.png")
        T = np.eye(4)
        T[2, 3] = 0.8
        np.savetxt(cat / "test" / f"{key}-pose.txt", T)
        T2 = T.copy()
        T2[0, 3] = 0.02
        np.savetxt(cat / "test" / f"{key}-pose_init.txt", T2)
    return tmp_path


def test_deepim_modelnet_dataset(modelnet_root):
    ds = DeepImModelNetDataset(
        modelnet_root, "chair", split="test", load_depth=True
    )
    assert len(ds) == 2
    obs = ds[0]
    assert obs.rgb.shape == (96, 128, 3)
    np.testing.assert_allclose(obs.depth[0, 0], 0.8, atol=1e-6)
    obj = obs.object_datas[0]
    assert obj.label == "modelnet_chair_chair_0001"
    np.testing.assert_allclose(obj.TWO[2, 3], 0.8)
    np.testing.assert_allclose(obj.TWO_init[0, 3], 0.02)
    x1, y1, x2, y2 = obj.bbox_modal
    assert 0 <= x1 < x2 <= 127 and 0 <= y1 < y2 <= 95


def test_pickle_scene_dataset(tmp_path):
    obs = SceneObservation(
        rgb=np.zeros((8, 8, 3), np.uint8),
        infos=ObservationInfos("0", 0),
        camera_data=CameraData(K=np.eye(3), resolution=(8, 8)),
    )
    p = tmp_path / "obs.pkl"
    with open(p, "wb") as fh:
        pickle.dump(obs, fh)
    ds = PickleSceneDataset([p])
    assert len(ds) == 1
    assert ds[0].rgb.shape == (8, 8, 3)


def test_distributed_smoke_script():
    from megapose6d_tpu.scripts.test_distributed import main

    main()  # 8 virtual CPU devices in the test env


def test_profiling_trace(tmp_path):
    import jax.numpy as jnp

    from megapose6d_tpu.utils import profiling

    with profiling.trace(tmp_path / "trace"):
        with profiling.annotate("phase"):
            (jnp.ones((8, 8)) * 2).block_until_ready()
    # Trace files written.
    assert any((tmp_path / "trace").rglob("*"))
