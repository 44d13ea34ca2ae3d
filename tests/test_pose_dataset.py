import numpy as np
import pytest

from megapose6d_tpu.data.augmentations import (
    CropResizeToAspectTransform,
    DepthEllipseDropoutTransform,
    DepthGaussianNoiseTransform,
    DepthMissingTransform,
    PillowBrightness,
    SceneObsAug,
    make_rgb_augmentations,
)
from megapose6d_tpu.data.pose_dataset import PoseDataset, collate_pose_data
from megapose6d_tpu.data.scene_dataset import (
    ObservationInfos,
    SceneObservation,
)
from megapose6d_tpu.data.types import CameraData, ObjectData


def make_obs(h=120, w=160, n_objects=2, seed=0):
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    seg = np.zeros((h, w), np.uint32)
    objs = []
    for i in range(n_objects):
        y0, x0 = 20 + i * 40, 30 + i * 50
        seg[y0 : y0 + 30, x0 : x0 + 30] = i + 1
        T = np.eye(4)
        T[2, 3] = 0.5 + 0.1 * i
        objs.append(
            ObjectData(
                label=f"obj{i}",
                TWO=T,
                unique_id=i + 1,
                bbox_modal=np.array([x0, y0, x0 + 30, y0 + 30], np.float64),
                visib_fract=0.9,
            )
        )
    K = np.asarray([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]])
    return SceneObservation(
        rgb=rgb,
        depth=np.full((h, w), 0.6, np.float32),
        segmentation=seg,
        infos=ObservationInfos("0", 0),
        object_datas=objs,
        camera_data=CameraData(K=K, resolution=(h, w)),
    )


def test_crop_resize_to_aspect():
    obs = make_obs(100, 200)  # wider than 4:3
    t = CropResizeToAspectTransform((120, 160))
    out = t(obs)
    assert out.rgb.shape == (120, 160, 3)
    assert out.camera_data.resolution == (120, 160)
    assert out.segmentation.shape == (120, 160)
    # K scaled consistently: fy scale = 120/100.
    np.testing.assert_allclose(out.camera_data.K[1, 1], 200 * 1.2, atol=1e-6)
    # boxes recomputed from segmentation and inside the image.
    for obj in out.object_datas:
        if obj.bbox_modal is not None:
            assert 0 <= obj.bbox_modal[0] < obj.bbox_modal[2] <= 160


def test_rgb_augmentations_change_image():
    obs = make_obs()
    np.random.seed(0)
    import random as _r

    _r.seed(0)
    aug = SceneObsAug(PillowBrightness((2.0, 2.0)), p=1.0)
    out = aug(obs)
    assert out.rgb.mean() > obs.rgb.mean()
    assert out.rgb.shape == obs.rgb.shape


def test_depth_augmentations():
    obs = make_obs()
    d0 = obs.depth.copy()
    out = DepthGaussianNoiseTransform(0.01)(obs)
    assert out.depth.shape == d0.shape
    assert not np.allclose(out.depth, d0)
    out = DepthMissingTransform(0.5)(obs)
    assert (out.depth == 0).sum() >= 0
    out = DepthEllipseDropoutTransform()(obs)
    assert out.depth.shape == d0.shape


def test_pose_dataset_sample_and_collate():
    import random as _r

    _r.seed(1)
    ds = PoseDataset(
        None, resize=(120, 160), apply_rgb_augmentation=False,
        min_area=100.0,
    )
    data = ds.make_data_from_obs(make_obs())
    assert data.rgb.shape == (120, 160, 3)
    assert data.label in ("obj0", "obj1")
    assert data.TCO[2, 3] in (0.5, 0.6)

    batch = collate_pose_data([data, data], {"obj0": 0, "obj1": 1})
    assert batch.rgbs.shape == (2, 120, 160, 3)
    assert batch.rgbs.max() <= 1.0
    assert batch.mesh_idx.shape == (2,)


def test_pose_dataset_min_area_filter():
    ds = PoseDataset(
        None, resize=(120, 160), apply_rgb_augmentation=False,
        min_area=10_000.0,  # bigger than any object
    )
    from megapose6d_tpu.data.pose_dataset import NoValidObjectError

    with pytest.raises(NoValidObjectError):
        ds.make_data_from_obs(make_obs())


def test_find_valid_data_retries():
    import random as _r

    _r.seed(2)
    ds = PoseDataset(None, resize=(120, 160), apply_rgb_augmentation=False)

    def gen():
        # First two observations have no objects.
        yield SceneObservation(
            rgb=np.zeros((120, 160, 3), np.uint8),
            infos=ObservationInfos("0", 0),
            camera_data=CameraData(
                K=np.eye(3) * 100, resolution=(120, 160)
            ),
        )
        yield make_obs()

    data = ds.find_valid_data(gen())
    assert data.label.startswith("obj")
