"""Evaluation CLI: one (dataset, detection, coarse) evaluation driven by a
structured `EvalConfig` (reference `evaluation/eval_config.py:42-83` +
`evaluation/evaluation.py:71-231`).

    python -m megapose6d_tpu.scripts.run_eval ds_name=ycbv.bop19 \\
        coarse_run=runs/coarse refiner_run=runs/refiner \\
        save_dir=eval_out n_frames=50 inference.SO3_grid_size=576

Any `EvalConfig` field is settable as `key=value`; nested inference /
hardware fields as `inference.<f>=` / `hardware.<f>=` (the OmegaConf-CLI
surface of the reference, run_full_megapose_eval.py:203-214). A few
legacy round-2 aliases (dataset=, out_dir=, so3_grid_size=, ...) are kept.
"""

from __future__ import annotations

import sys

from ..evaluation.eval_config import EvalConfig, apply_eval_overrides
from ..evaluation.evaluation import run_eval as _run_eval

# Round-2 CLI key -> structured-config key.
LEGACY_KEYS = {
    "dataset": "ds_name",
    "out_dir": "save_dir",
    "so3_grid_size": "inference.SO3_grid_size",
    "n_refiner_iterations": "inference.n_refiner_iterations",
    "n_pose_hypotheses": "inference.n_pose_hypotheses",
    "max_detections": "inference.max_detections",
}


def normalize_argv(argv: list[str]) -> list[str]:
    out = []
    for a in argv:
        k, _, v = a.partition("=")
        k = LEGACY_KEYS.get(k, k)
        if k == "n_frames" and v in ("0", ""):
            continue  # legacy "0 = all frames"
        if k == "load_depth":
            v = {"0": "false", "1": "true"}.get(v, v)
        out.append(f"{k}={v}")
    return out


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cfg = apply_eval_overrides(EvalConfig(), normalize_argv(argv))
    if cfg.save_dir is None:
        cfg = __import__("dataclasses").replace(cfg, save_dir="eval_out")
    out = _run_eval(cfg)
    return out["summary"] if out else None


if __name__ == "__main__":
    main()
