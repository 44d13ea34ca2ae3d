"""CNN backbones (flax.linen, NHWC, bf16-compute friendly).

TPU-native re-design of the reference's backbones (megapose6d:
src/megapose/models/torchvision_resnet.py — ResNet-34 with configurable
input channels and a 512-d feature head; src/megapose/models/wide_resnet.py
— pre-activation WideResNet-18/34). Deviations, deliberate for TPU:
  - NHWC layout (XLA's native conv layout on TPU).
  - GroupNorm instead of BatchNorm: stateless (scan/pjit-friendly, no
    cross-replica sync needed — the reference needs SyncBN for its RGB-D
    configs, train_megapose.py:243-244).
  - Compute dtype configurable (bfloat16 on the MXU), params float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _norm(groups: int, dtype: Dtype) -> Callable:
    return lambda: nn.GroupNorm(
        num_groups=groups, dtype=dtype, param_dtype=jnp.float32
    )


class BasicBlock(nn.Module):
    """torchvision-style BasicBlock (2x 3x3 conv + skip)."""

    features: int
    strides: int = 1
    norm_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.norm_groups, self.dtype)
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(y)
        y = norm()(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-18/34 trunk + feature head.

    Output: `[B, n_features]` (the reference's backbone contract —
    `backbone.n_features`, pose_rigid.py:116-118; heads attach on top).

    `pool` selects the head:
      - "avg": global average pool + Dense (torchvision/reference layout).
      - "spatial": 1x1 conv to `spatial_ch` channels, flatten the HxW map,
        Dense. Preserves spatial arrangement, which global pooling
        destroys — measured on the synthetic demo task, GAP features
        linearly decode the needed TRANSLATION (ridge R2=0.84) but carry
        ZERO rotation information (R2~=0.0) after thousands of steps; the
        spatial head is what makes rotation refinement learnable at small
        data scale (DeepIM's own head flattens spatial features for the
        same reason).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-34
    width: int = 64
    n_features: int = 512
    norm_groups: int = 32
    dtype: Dtype = jnp.float32
    pool: str = "avg"
    spatial_ch: int = 64

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.norm_groups, self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width, (7, 7), strides=2, padding=3, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = nn.relu(norm()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            features = self.width * (2**i)
            for b in range(n_blocks):
                strides = 2 if (i > 0 and b == 0) else 1
                x = BasicBlock(
                    features, strides, self.norm_groups, self.dtype
                )(x)
        if self.pool == "spatial":
            x = nn.Conv(
                self.spatial_ch, (1, 1), use_bias=False, dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            x = nn.relu(
                nn.GroupNorm(
                    num_groups=min(8, self.spatial_ch), dtype=self.dtype,
                    param_dtype=jnp.float32,
                )(x)
            )
            x = x.reshape(x.shape[0], -1)  # [B, H*W*spatial_ch]
        else:
            x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(
            self.n_features, dtype=self.dtype, param_dtype=jnp.float32
        )(x)
        return x.astype(jnp.float32)


class WideResNetBlock(nn.Module):
    """Pre-activation wide block (wide_resnet.py:59-87)."""

    features: int
    strides: int = 1
    norm_groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.norm_groups, self.dtype)
        y = nn.relu(norm()(x))
        shortcut = x
        if x.shape[-1] != self.features or self.strides != 1:
            shortcut = nn.Conv(
                self.features, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(y)
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(y)
        return y + shortcut


class WideResNet(nn.Module):
    """Pre-act WideResNet-18/34 (wide_resnet.py:90-133), widen factor 2."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # WRN-18
    width: int = 64
    widen: int = 2
    n_features: int = 512
    norm_groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            features = self.width * self.widen * (2**i)
            for b in range(n_blocks):
                strides = 2 if b == 0 else 1
                x = WideResNetBlock(
                    features, strides, self.norm_groups, self.dtype
                )(x)
        x = nn.relu(
            nn.GroupNorm(
                num_groups=self.norm_groups, dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        )
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(
            self.n_features, dtype=self.dtype, param_dtype=jnp.float32
        )(x)
        return x.astype(jnp.float32)


class ZooBasicBlockV2(nn.Module):
    """Pre-activation block matching the reference zoo checkpoints
    (wide_resnet.py:BasicBlockV2:29-56): BN -> relu -> conv3x3 -> BN ->
    relu -> conv3x3, residual taken from the PRE-ACTIVATED input through a
    norm-free 1x1 conv when shape changes. BatchNorm runs from the
    converted checkpoint's running stats at inference (`train=False`,
    the default) and updates batch statistics when `train=True` (the
    reference fine-tunes these BN backbones with torch SyncBN,
    train_megapose.py:243-244; on TPU the batch axis is data-parallel
    sharded, so `axis_name='dp'` cross-replica BN is the SyncBN analog
    when applied under pjit/shard_map)."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32
    train: bool = False
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not self.train, dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
                axis_name=self.bn_axis_name if self.train else None,
            )

        out = nn.relu(bn("bn1")(x))
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32, name="downsample",
            )(out)
        else:
            residual = x
        out = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=1,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv1",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv2",
        )(out)
        return out + residual


class ZooWideResNet(nn.Module):
    """The reference checkpoints' actual backbone: `backbone_str=resnet34`
    resolves to WideResNet34 (pose_models_cfg.py:110-113, wide_resnet.py:
    59-133) — 5x5/2 BN stem, maxpool, 4 pre-act stages, global mean pool.
    Weight-compatible with converted torch state_dicts
    (interop/torch_convert.py); module names mirror the torch key paths."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # WRN-34
    width: int = 64
    n_features: int = 512
    dtype: Dtype = jnp.float32
    train: bool = False
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width, (5, 5), strides=2, padding=2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        x = nn.relu(
            nn.BatchNorm(
                use_running_average=not self.train, dtype=self.dtype,
                param_dtype=jnp.float32, name="bn1",
                axis_name=self.bn_axis_name if self.train else None,
            )(x)
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            features = self.width * (2**i)
            for b in range(n_blocks):
                strides = 2 if (i > 0 and b == 0) else 1
                x = ZooBasicBlockV2(
                    features, strides, self.dtype,
                    train=self.train, bn_axis_name=self.bn_axis_name,
                    name=f"layer{i + 1}_{b}",
                )(x)
        x = jnp.mean(x, axis=(1, 2))  # [B, 512]
        return x.astype(jnp.float32)


def make_backbone(name: str, n_features: int = 512, dtype=jnp.float32):
    """Backbone registry (training/pose_models_cfg.py:check_update_config
    name scheme: resnet34 / resnet18 / wide_resnet18 / wide_resnet34).

    `zoo_resnet34` / `zoo_resnet18` are the torch-checkpoint-compatible
    BatchNorm variants (what the reference actually builds for
    backbone_str=resnet34, pose_models_cfg.py:110-113); the default
    `resnet34` stays the GroupNorm TPU-native design.
    """
    if name == "resnet34":
        return ResNet((3, 4, 6, 3), n_features=n_features, dtype=dtype)
    if name == "resnet18":
        return ResNet((2, 2, 2, 2), n_features=n_features, dtype=dtype)
    if name == "resnet34-spatial":
        return ResNet(
            (3, 4, 6, 3), n_features=n_features, dtype=dtype, pool="spatial"
        )
    if name == "resnet18-spatial":
        return ResNet(
            (2, 2, 2, 2), n_features=n_features, dtype=dtype, pool="spatial"
        )
    if name == "wide_resnet18":
        return WideResNet((2, 2, 2, 2), n_features=n_features, dtype=dtype)
    if name == "wide_resnet34":
        return WideResNet((3, 4, 6, 3), n_features=n_features, dtype=dtype)
    if name == "zoo_resnet34":
        return ZooWideResNet((3, 4, 6, 3), n_features=n_features, dtype=dtype)
    if name == "zoo_resnet18":
        return ZooWideResNet((2, 2, 2, 2), n_features=n_features, dtype=dtype)
    if name == "zoo_resnet34-train":
        # Fine-tunable variant: BN batch_stats become mutable
        # (apply(..., mutable=['batch_stats'])); the reference's SyncBN
        # fine-tuning path (train_megapose.py:243-244).
        return ZooWideResNet(
            (3, 4, 6, 3), n_features=n_features, dtype=dtype, train=True
        )
    if name == "zoo_resnet18-train":
        return ZooWideResNet(
            (2, 2, 2, 2), n_features=n_features, dtype=dtype, train=True
        )
    raise ValueError(f"unknown backbone: {name}")
