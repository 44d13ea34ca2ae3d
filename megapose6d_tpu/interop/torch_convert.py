"""torch -> flax weight conversion for the reference model zoo.

The four released megapose-1.0 checkpoints (reference utils/load_model.py:
8-47) are torch state_dicts of PosePredictor models whose backbone is the
pre-activation WideResNet (`backbone_str=resnet34` builds WideResNet34,
pose_models_cfg.py:110-113). This module maps those state_dicts onto the
weight-compatible flax modules (`models/backbones.py:ZooWideResNet` +
`PosePredictor` heads):

  torch key                                   flax path
  backbone.conv1.weight [O,I,5,5]          -> params/backbone/conv1/kernel
  backbone.bn1.{weight,bias}               -> params/backbone/bn1/{scale,bias}
  backbone.bn1.running_{mean,var}          -> batch_stats/backbone/bn1/{mean,var}
  backbone.layerL.B.{bn1,conv1,bn2,conv2}  -> params/backbone/layerL_B/...
  backbone.layerL.B.downsample.weight      -> params/backbone/layerL_B/downsample/kernel
  pose_fc.{weight,bias}                    -> params/pose_fc/{kernel,bias}
  views_logits_head.{weight,bias}          -> params/views_logits_fc/{kernel,bias}

Conv kernels transpose OIHW -> HWIO; Linear weights transpose [out, in] ->
[in, out]. Old checkpoints go through `change_keys_of_older_models` first
(reference utils/models_compat.py:17-27 semantics).

CAVEAT (unproven against the real zoo): this environment has no network
egress, so the mapping is round-trip tested against a torch WideResNet34
reconstructed from the reference source (tests/test_torch_interop.py),
NOT against the released checkpoint files themselves. If a released
state_dict carries keys outside the mapped set, `convert_state_dict`
raises with the full unmatched-key list rather than silently dropping
them — run it once on the real files before relying on parity.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np


def change_keys_of_older_models(state_dict: Mapping[str, Any]) -> dict:
    """Key-rename shim for pre-release checkpoints
    (utils/models_compat.py:17-27)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("backbone.backbone"):
            k = "backbone." + k[len("backbone.backbone.") :]
        elif k.startswith("backbone.head.0."):
            k = "views_logits_head." + k[len("backbone.head.0.") :]
        out[k] = v
    return out


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def pose_predictor_params_from_torch(
    state_dict: Mapping[str, Any],
) -> dict:
    """Convert a reference PosePredictor state_dict to flax variables.

    Returns `{"params": ..., "batch_stats": ...}` for a PosePredictor built
    with `backbone="zoo_resnet34"` (or zoo_resnet18) whose flag set matches
    the checkpoint's config. Unknown keys raise — silent drops would ship a
    half-converted model.
    """
    state_dict = change_keys_of_older_models(dict(state_dict))
    params: dict = {}
    stats: dict = {}

    def put_conv(path, w):
        _set(params, path + ("kernel",), _np(w).transpose(2, 3, 1, 0))

    def put_bn(path, base_key):
        _set(params, path + ("scale",), _np(state_dict[base_key + ".weight"]))
        _set(params, path + ("bias",), _np(state_dict[base_key + ".bias"]))
        _set(
            stats, path + ("mean",), _np(state_dict[base_key + ".running_mean"])
        )
        _set(
            stats, path + ("var",), _np(state_dict[base_key + ".running_var"])
        )

    def put_linear(path, base_key):
        _set(
            params, path + ("kernel",), _np(state_dict[base_key + ".weight"]).T
        )
        _set(params, path + ("bias",), _np(state_dict[base_key + ".bias"]))

    handled: set[str] = {
        k for k in state_dict if k.endswith("num_batches_tracked")
    }

    # Stem.
    put_conv(("backbone", "conv1"), state_dict["backbone.conv1.weight"])
    handled.add("backbone.conv1.weight")
    put_bn(("backbone", "bn1"), "backbone.bn1")
    handled.update(
        f"backbone.bn1.{s}" for s in ("weight", "bias", "running_mean", "running_var")
    )

    # Stages.
    for key in list(state_dict):
        parts = key.split(".")
        if parts[0] != "backbone" or not parts[1].startswith("layer"):
            continue
        layer, block = parts[1], parts[2]
        flax_block = ("backbone", f"{layer}_{block}")
        mod = parts[3]
        if mod in ("conv1", "conv2") and parts[4] == "weight":
            put_conv(flax_block + (mod,), state_dict[key])
            handled.add(key)
        elif mod in ("bn1", "bn2"):
            base = f"backbone.{layer}.{block}.{mod}"
            if parts[4] == "weight":  # convert the whole BN once
                put_bn(flax_block + (mod,), base)
                handled.update(
                    f"{base}.{s}"
                    for s in ("weight", "bias", "running_mean", "running_var")
                )
            else:
                handled.add(key)
        elif mod == "downsample" and parts[4] == "weight":
            put_conv(flax_block + ("downsample",), state_dict[key])
            handled.add(key)

    # Heads.
    if "pose_fc.weight" in state_dict:
        put_linear(("pose_fc",), "pose_fc")
        handled.update(("pose_fc.weight", "pose_fc.bias"))
    if "views_logits_head.weight" in state_dict:
        put_linear(("views_logits_fc",), "views_logits_head")
        handled.update(("views_logits_head.weight", "views_logits_head.bias"))

    unknown = sorted(set(state_dict) - handled)
    if unknown:
        raise ValueError(
            f"unconverted checkpoint keys ({len(unknown)}): {unknown[:8]}..."
        )
    return {"params": params, "batch_stats": stats}


def load_torch_pose_checkpoint(path: str | Path) -> dict:
    """Load a reference checkpoint.pth.tar and convert it
    (inference/utils.py:129-146 load path)."""
    import torch

    ckpt = torch.load(Path(path), map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    return pose_predictor_params_from_torch(state_dict)
