"""Structured evaluation configs + save-key naming.

Re-design of the reference's `evaluation/eval_config.py:42-105`
(`EvalConfig` / `FullEvalConfig` / `BOPEvalConfig`) and the save-key
semantics of `evaluation/evaluation.py:48-68` for the TPU stack: torch
run-ids become checkpoint run dirs, `HardwareConfig.n_gpus` becomes
`n_chips`, and the nested `InferenceConfig` is this repo's static-shape
variant (`inference/types.py`). `apply_eval_overrides` accepts the same
`key=value` dotlist the training CLI uses, including nested
`inference.<field>=...` keys.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

from ..inference.types import InferenceConfig

# BOP19 challenge test sets (reference eval_config.py:25-33).
BOP_TEST_DATASETS = [
    "lmo.bop19",
    "tless.bop19",
    "tudl.bop19",
    "icbin.bop19",
    "itodd.bop19",
    "hb.bop19",
    "ycbv.bop19",
]


@dataclasses.dataclass
class HardwareConfig:
    """eval_config.py:41-44 (`n_gpus` -> `n_chips`)."""

    n_cpus: int = 8
    n_chips: int = 1


@dataclasses.dataclass
class EvalConfig:
    """One (dataset, detection-type, coarse-type) evaluation
    (eval_config.py:42-83).

    Reference `*_run_id` fields name torch checkpoints resolved through
    EXP_DIR; here they are checkpoint run dirs written by
    `scripts/run_training.py` / `run_detector_training.py` (empty string =
    randomly-initialized model, useful for smoke tests).
    """

    # Networks (eval_config.py:55-58)
    detector_run: str = ""
    coarse_run: str = ""
    refiner_run: str = ""

    # Dataset (eval_config.py:60-61)
    ds_name: str = "ycbv.bop19"

    # Inference (eval_config.py:63-64)
    inference: InferenceConfig = dataclasses.field(
        default_factory=InferenceConfig
    )

    # Run management (eval_config.py:66-75)
    result_id: Optional[str] = None
    save_dir: Optional[str] = None
    n_frames: Optional[int] = None
    n_dataloader_workers: int = 8
    skip_inference: bool = False
    skip_evaluation: bool = False  # in-tree meters run by default here

    # TPU-side model/render knobs (no reference analog; the reference
    # bakes these into the checkpoints' cfg).
    render_size: tuple[int, int] = (240, 320)
    max_faces: int = 4096
    load_depth: bool = False

    # Distributed eval shard (reference gets these from its env).
    rank: int = 0
    world_size: int = 1

    # Infos (eval_config.py:77-79)
    global_batch_size: Optional[int] = None
    hardware: HardwareConfig = dataclasses.field(
        default_factory=HardwareConfig
    )

    # Debug (eval_config.py:81-82)
    debug: bool = False


@dataclasses.dataclass
class FullEvalConfig(EvalConfig):
    """Dataset x (detection_type, coarse_type) sweep
    (eval_config.py:85-92)."""

    detection_coarse_types: list = dataclasses.field(
        default_factory=lambda: [("gt", "SO3_grid")]
    )
    ds_names: Optional[list] = None
    run_bop_eval: bool = False  # official toolkit absent in this env
    bop_toolkit_dir: str = ""
    modelnet_categories: Optional[list] = None


@dataclasses.dataclass
class BOPEvalConfig:
    """Arguments of one official-toolkit scoring run
    (eval_config.py:95-105)."""

    results_path: str
    dataset: str
    split: str
    eval_dir: str
    method: str  # 'refiner/final', 'depth_refiner', ...
    detection_method: Optional[str] = None
    convert_only: bool = False


def generate_save_key(
    detection_type: str, coarse_estimation_type: str
) -> str:
    """evaluation/evaluation.py:48-49."""
    return f"{detection_type}+{coarse_estimation_type}"


def get_save_dir(cfg: EvalConfig) -> Path:
    """`<save_dir>/<ds_name>/<detection>+<coarse>`
    (evaluation/evaluation.py:52-68)."""
    assert cfg.save_dir is not None
    save_key = generate_save_key(
        cfg.inference.detection_type, cfg.inference.coarse_estimation_type
    )
    return Path(cfg.save_dir) / cfg.ds_name / save_key


# One dotlist coercion for all CLIs (training/config.py); a fix there
# applies to the eval surface too.
from ..training.config import _coerce  # noqa: E402


def apply_eval_overrides(cfg, argv: list[str]):
    """`key=value` dotlist, with `inference.<f>` / `hardware.<f>` nesting
    (the OmegaConf CLI surface of run_full_megapose_eval.py:203-214)."""
    hints: dict[str, str] = {}
    for klass in type(cfg).__mro__:
        hints.update(getattr(klass, "__annotations__", {}))
    updates: dict[str, Any] = {}
    inf_updates: dict[str, Any] = {}
    hw_updates: dict[str, Any] = {}
    for arg in argv:
        assert "=" in arg, f"expected key=value, got {arg!r}"
        key, value = arg.split("=", 1)
        if key.startswith("inference."):
            f = key[len("inference."):]
            assert hasattr(cfg.inference, f), f"unknown key {key!r}"
            inf_updates[f] = _coerce(value, getattr(cfg.inference, f))
        elif key.startswith("hardware."):
            f = key[len("hardware."):]
            assert hasattr(cfg.hardware, f), f"unknown key {key!r}"
            hw_updates[f] = _coerce(value, getattr(cfg.hardware, f))
        elif key == "detection_coarse_types":
            # "gt:SO3_grid,detector:SO3_grid" -> [("gt","SO3_grid"), ...]
            updates[key] = [
                tuple(p.split(":")) for p in value.split(",") if p
            ]
        else:
            assert hasattr(cfg, key), f"unknown config key {key!r}"
            updates[key] = _coerce(
                value, getattr(cfg, key), str(hints.get(key, ""))
            )
    if inf_updates:
        updates["inference"] = dataclasses.replace(
            cfg.inference, **inf_updates
        )
    if hw_updates:
        updates["hardware"] = dataclasses.replace(cfg.hardware, **hw_updates)
    return dataclasses.replace(cfg, **updates)


def save_eval_config(cfg: EvalConfig, path: str | Path) -> None:
    Path(path).write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
    )
