import numpy as np
import pytest

from megapose6d_tpu.data.scene_dataset import ObservationInfos, SceneObservation
from megapose6d_tpu.data.types import CameraData, ObjectData
from megapose6d_tpu.data.web_scene_dataset import (
    IterableWebSceneDataset,
    WebSceneDataset,
    write_scene_ds_as_wds,
)


def make_obs(i, rng):
    T = np.eye(4)
    T[2, 3] = 0.4 + 0.01 * i
    return SceneObservation(
        rgb=rng.randint(0, 255, (48, 64, 3), dtype=np.uint8),
        depth=np.full((48, 64), 0.5 + 0.001 * i, np.float32),
        segmentation=(rng.rand(48, 64) > 0.5).astype(np.uint32),
        infos=ObservationInfos(scene_id=str(i // 3), view_id=i),
        object_datas=[
            ObjectData(
                label=f"obj{i % 2}",
                TWO=T,
                unique_id=1,
                bbox_modal=np.array([1.0, 2, 10, 12]),
                visib_fract=0.8,
            )
        ],
        camera_data=CameraData(
            K=np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]]),
            resolution=(48, 64),
        ),
    )


@pytest.fixture(scope="module")
def wds_dir(tmp_path_factory):
    rng = np.random.RandomState(0)
    out = tmp_path_factory.mktemp("wds")
    obs = [make_obs(i, rng) for i in range(7)]
    shards = write_scene_ds_as_wds(iter(obs), out, frames_per_shard=3)
    assert len(shards) == 3  # 3 + 3 + 1
    return out


def test_roundtrip_random_access(wds_dir):
    ds = WebSceneDataset(wds_dir, load_depth=True)
    assert len(ds) == 7
    obs = ds[4]
    assert obs.rgb.shape == (48, 64, 3)
    np.testing.assert_allclose(obs.depth.mean(), 0.5 + 0.004, atol=2e-3)
    assert obs.object_datas[0].label in ("obj0", "obj1")
    np.testing.assert_allclose(
        obs.object_datas[0].TWO[2, 3], 0.44, atol=1e-5
    )
    np.testing.assert_allclose(obs.camera_data.K[0, 0], 100.0)
    assert obs.segmentation is not None


def test_iterable_shuffled(wds_dir):
    ds = WebSceneDataset(wds_dir, load_depth=False)
    it = iter(IterableWebSceneDataset(ds, buffer_size=4, seed=1))
    seen = [next(it).infos.view_id for _ in range(20)]
    # Infinite: more samples than the dataset; all ids valid.
    assert all(0 <= v < 7 for v in seen)
    assert len(set(seen)) == 7  # eventually covers everything
