"""Host-side scene-observation augmentations (training input pipeline).

Re-design of the reference's `datasets/augmentations.py` with the same
transform set and default parameters (megapose6d:
src/megapose/datasets/augmentations.py:40-493): composable
`SceneObservationTransform`s with probability wrappers; PIL-based RGB
enhancement; the Cleargrasp-derived depth-corruption suite; background
replacement; and the aspect crop+resize that also updates K and recomputes
boxes from segmentation.

These run in host dataloader workers (numpy/PIL), not on device — same
division of labor as the reference.
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Sequence

import numpy as np
import PIL.Image
import PIL.ImageEnhance
import PIL.ImageFilter

from .scene_dataset import SceneObservation


class SceneObservationTransform:
    def __call__(self, obs: SceneObservation) -> SceneObservation:
        raise NotImplementedError


class SceneObsAug(SceneObservationTransform):
    """Apply `transform` with probability `p`; lists compose sequentially
    (augmentations.py:45-62)."""

    def __init__(self, transform, p: float = 1.0):
        self.transform = (
            ComposedTransform(transform)
            if isinstance(transform, (list, tuple))
            else transform
        )
        self.p = p

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        if random.random() <= self.p:
            return self.transform(obs)
        return obs


class ComposedTransform(SceneObservationTransform):
    def __init__(self, transforms: Sequence[SceneObservationTransform]):
        self.transforms = list(transforms)

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        for t in self.transforms:
            obs = t(obs)
        return obs


# ---------------------------------------------------------------------------
# RGB (PIL) — augmentations.py:65-107
# ---------------------------------------------------------------------------

class _PillowEnhance(SceneObservationTransform):
    enhancer: type
    default_interval: tuple[float, float]

    def __init__(self, factor_interval: tuple[float, float] | None = None):
        self.factor_interval = factor_interval or self.default_interval

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        img = PIL.Image.fromarray(obs.rgb)
        img = self.enhancer(img).enhance(
            factor=random.uniform(*self.factor_interval)
        )
        return dataclasses.replace(obs, rgb=np.array(img))


class PillowSharpness(_PillowEnhance):
    enhancer = PIL.ImageEnhance.Sharpness
    default_interval = (0.0, 50.0)


class PillowContrast(_PillowEnhance):
    enhancer = PIL.ImageEnhance.Contrast
    default_interval = (0.2, 50.0)


class PillowBrightness(_PillowEnhance):
    enhancer = PIL.ImageEnhance.Brightness
    default_interval = (0.1, 6.0)


class PillowColor(_PillowEnhance):
    enhancer = PIL.ImageEnhance.Color
    default_interval = (0.0, 20.0)


class PillowBlur(SceneObservationTransform):
    def __init__(self, factor_interval: tuple[int, int] = (1, 3)):
        self.factor_interval = factor_interval

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        k = random.randint(*self.factor_interval)
        img = PIL.Image.fromarray(obs.rgb).filter(
            PIL.ImageFilter.GaussianBlur(k)
        )
        return dataclasses.replace(obs, rgb=np.array(img))


# ---------------------------------------------------------------------------
# Depth corruption suite — augmentations.py:110-368 (Cleargrasp-derived)
# ---------------------------------------------------------------------------

class DepthGaussianNoiseTransform(SceneObservationTransform):
    def __init__(self, std_dev: float = 0.02):
        self.std_dev = std_dev

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        depth = np.array(obs.depth)
        noise = np.random.normal(scale=self.std_dev, size=depth.shape)
        depth[depth > 0] += noise[depth > 0]
        return dataclasses.replace(obs, depth=np.clip(depth, 0, None))


class DepthCorrelatedGaussianNoiseTransform(SceneObservationTransform):
    """Low-frequency noise: sampled on a coarse grid, bilinearly upsampled
    (augmentations.py:134-161)."""

    def __init__(self, std_dev: float = 0.01, gp_rescale_factor_min: float = 15.0,
                 gp_rescale_factor_max: float = 40.0):
        self.std_dev = std_dev
        self.rescale = (gp_rescale_factor_min, gp_rescale_factor_max)

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        depth = np.array(obs.depth)
        H, W = depth.shape
        f = random.uniform(*self.rescale)
        small = (max(int(H / f), 2), max(int(W / f), 2))
        noise = np.random.normal(0.0, self.std_dev, small)
        noise_img = np.array(
            PIL.Image.fromarray(noise.astype(np.float32)).resize(
                (W, H), PIL.Image.BILINEAR
            )
        )
        depth[depth > 0] += noise_img[depth > 0]
        return dataclasses.replace(obs, depth=np.clip(depth, 0, None))


class DepthMissingTransform(SceneObservationTransform):
    """Randomly zero out a fraction of valid depth pixels
    (augmentations.py:164-182)."""

    def __init__(self, max_missing_fraction: float = 0.2):
        self.max_missing_fraction = max_missing_fraction

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        depth = np.array(obs.depth)
        v_idx = np.nonzero(depth.reshape(-1) > 0)[0]
        if len(v_idx):
            frac = random.uniform(0, self.max_missing_fraction)
            drop = np.random.choice(
                v_idx, int(len(v_idx) * frac), replace=False
            )
            flat = depth.reshape(-1)
            flat[drop] = 0
            depth = flat.reshape(depth.shape)
        return dataclasses.replace(obs, depth=depth)


class DepthDropoutTransform(SceneObservationTransform):
    """Whole depth image dropped (augmentations.py:185-190)."""

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        return dataclasses.replace(obs, depth=np.zeros_like(obs.depth))


def _random_ellipses(depth, n_max=10, gamma_shape=5.0, gamma_scale=1.0):
    H, W = depth.shape
    n = np.random.poisson(n_max * 0.5)
    ys = np.random.randint(0, H, n)
    xs = np.random.randint(0, W, n)
    rx = np.random.gamma(gamma_shape, gamma_scale, n).astype(int) + 1
    ry = np.random.gamma(gamma_shape, gamma_scale, n).astype(int) + 1
    ang = np.random.uniform(0, np.pi, n)
    yy, xx = np.mgrid[0:H, 0:W]
    mask = np.zeros((H, W), bool)
    for i in range(n):
        ca, sa = np.cos(ang[i]), np.sin(ang[i])
        dx = xx - xs[i]
        dy = yy - ys[i]
        xr = ca * dx + sa * dy
        yr = -sa * dx + ca * dy
        mask |= (xr / rx[i]) ** 2 + (yr / ry[i]) ** 2 <= 1.0
    return mask


class DepthEllipseDropoutTransform(SceneObservationTransform):
    """Drop elliptical blobs (sensor-shadow artifacts,
    augmentations.py:193-287)."""

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        depth = np.array(obs.depth)
        depth[_random_ellipses(depth)] = 0
        return dataclasses.replace(obs, depth=depth)


class DepthEllipseNoiseTransform(SceneObservationTransform):
    def __init__(self, std_dev: float = 0.01):
        self.std_dev = std_dev

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        depth = np.array(obs.depth)
        mask = _random_ellipses(depth) & (depth > 0)
        depth[mask] += np.random.normal(0, self.std_dev)
        return dataclasses.replace(obs, depth=np.clip(depth, 0, None))


class DepthBlurTransform(SceneObservationTransform):
    def __init__(self, factor_interval: tuple[int, int] = (3, 7)):
        self.factor_interval = factor_interval

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        k = random.randint(*self.factor_interval)
        depth = np.array(
            PIL.Image.fromarray(obs.depth.astype(np.float32)).filter(
                PIL.ImageFilter.GaussianBlur(k)
            )
        )
        return dataclasses.replace(obs, depth=depth)


class DepthBackgroundDropoutTransform(SceneObservationTransform):
    """Zero depth outside all object masks (augmentations.py:358-368)."""

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        assert obs.segmentation is not None
        depth = np.array(obs.depth)
        depth[obs.segmentation == 0] = 0
        return dataclasses.replace(obs, depth=depth)


# ---------------------------------------------------------------------------
# Background replacement — augmentations.py:371-407
# ---------------------------------------------------------------------------

class ReplaceBackgroundTransform(SceneObservationTransform):
    def __init__(self, image_paths: Sequence[str | Path]):
        self.image_paths = list(image_paths)
        assert self.image_paths, "no background images"

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        assert obs.segmentation is not None
        H, W = obs.rgb.shape[:2]
        path = random.choice(self.image_paths)
        bg = PIL.Image.open(path).convert("RGB").resize((W, H))
        rgb = np.array(obs.rgb)
        m = obs.segmentation == 0
        rgb[m] = np.asarray(bg)[m]
        return dataclasses.replace(obs, rgb=rgb)


class VOCBackgroundAugmentation(ReplaceBackgroundTransform):
    def __init__(self, voc_root: str | Path):
        images = sorted(Path(voc_root).glob("JPEGImages/*.jpg"))
        super().__init__(images)


# ---------------------------------------------------------------------------
# Aspect crop + resize — augmentations.py:410-493
# ---------------------------------------------------------------------------

class CropResizeToAspectTransform(SceneObservationTransform):
    """Crop to the target aspect ratio then resize; updates K and
    recomputes modal boxes from the segmentation."""

    def __init__(self, resize: tuple[int, int] = (480, 640)):
        self.resize = (min(resize), max(resize))  # (h, w)

    def __call__(self, obs: SceneObservation) -> SceneObservation:
        h, w = obs.rgb.shape[:2]
        out_h, out_w = self.resize
        if (h, w) == (out_h, out_w):
            return obs
        target_aspect = out_w / out_h
        # Center-crop to aspect.
        if w / h > target_aspect:
            crop_w = int(round(h * target_aspect))
            crop_h = h
        else:
            crop_w = w
            crop_h = int(round(w / target_aspect))
        x0 = (w - crop_w) // 2
        y0 = (h - crop_h) // 2

        rgb = obs.rgb[y0 : y0 + crop_h, x0 : x0 + crop_w]
        rgb = np.array(
            PIL.Image.fromarray(rgb).resize((out_w, out_h), PIL.Image.BILINEAR)
        )
        depth = None
        if obs.depth is not None:
            depth = obs.depth[y0 : y0 + crop_h, x0 : x0 + crop_w]
            depth = np.array(
                PIL.Image.fromarray(depth.astype(np.float32)).resize(
                    (out_w, out_h), PIL.Image.NEAREST
                )
            )
        seg = None
        if obs.segmentation is not None:
            seg = obs.segmentation[y0 : y0 + crop_h, x0 : x0 + crop_w]
            seg = np.array(
                PIL.Image.fromarray(seg.astype(np.int32)).resize(
                    (out_w, out_h), PIL.Image.NEAREST
                )
            ).astype(np.uint32)

        sx = out_w / crop_w
        sy = out_h / crop_h
        K = np.array(obs.camera_data.K, np.float64)
        K[0, 0] *= sx
        K[1, 1] *= sy
        K[0, 2] = (K[0, 2] - x0) * sx
        K[1, 2] = (K[1, 2] - y0) * sy
        camera_data = dataclasses.replace(
            obs.camera_data, K=K, resolution=(out_h, out_w)
        )

        # Recompute modal boxes from the segmentation.
        object_datas = []
        for obj in obs.object_datas:
            obj = dataclasses.replace(obj)
            if seg is not None and obj.unique_id is not None:
                ys, xs = np.nonzero(seg == obj.unique_id)
                if len(ys):
                    obj.bbox_modal = np.array(
                        [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                        np.float64,
                    )
                else:
                    obj.bbox_modal = None
            object_datas.append(obj)

        return dataclasses.replace(
            obs,
            rgb=rgb,
            depth=depth,
            segmentation=seg,
            camera_data=camera_data,
            object_datas=object_datas,
        )


def make_rgb_augmentations() -> SceneObsAug:
    """Default RGB aug stack (pose_dataset.py:136-148)."""
    return SceneObsAug(
        [
            SceneObsAug(PillowBlur((1, 3)), p=0.4),
            SceneObsAug(PillowSharpness((0.0, 50.0)), p=0.3),
            SceneObsAug(PillowContrast((0.2, 50.0)), p=0.3),
            SceneObsAug(PillowBrightness((0.1, 6.0)), p=0.5),
            SceneObsAug(PillowColor((0.0, 20.0)), p=0.3),
        ],
        p=0.8,
    )


def make_depth_augmentations() -> SceneObsAug:
    """Default depth corruption stack (pose_dataset.py:151-198)."""
    return SceneObsAug(
        [
            SceneObsAug(DepthBlurTransform(), p=0.3),
            SceneObsAug(DepthEllipseDropoutTransform(), p=0.3),
            SceneObsAug(DepthGaussianNoiseTransform(0.01), p=0.3),
            SceneObsAug(DepthMissingTransform(0.2), p=0.3),
            SceneObsAug(DepthCorrelatedGaussianNoiseTransform(0.01), p=0.3),
        ],
        p=1.0,
    )
