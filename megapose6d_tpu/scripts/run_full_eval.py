"""Multi-dataset evaluation sweep driven by `FullEvalConfig`.

Re-design of the reference's `scripts/run_full_megapose_eval.py:112-188`:
for each dataset in `ds_names` and each (detection_type,
coarse_estimation_type) pair in `detection_coarse_types`, derive an
`EvalConfig` (save key `<detection>+<coarse>`), run the evaluation, then
collect `BOPEvalConfig`s and (optionally) launch official bop_toolkit
scoring subprocesses on rank 0.

    python -m megapose6d_tpu.scripts.run_full_eval \\
        ds_names=synth.bop19 save_dir=full_eval \\
        detection_coarse_types=gt:SO3_grid,detector:SO3_grid \\
        coarse_run=runs/coarse refiner_run=runs/refiner \\
        detector_run=runs/detector
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

from ..evaluation.bop import run_bop_evaluation
from ..evaluation.eval_config import (
    BOP_TEST_DATASETS,
    BOPEvalConfig,
    EvalConfig,
    FullEvalConfig,
    apply_eval_overrides,
    generate_save_key,
    save_eval_config,
)
from ..evaluation.evaluation import run_eval
from ..utils.logging import get_logger

logger = get_logger(__name__)


def create_eval_cfg(
    cfg: FullEvalConfig,
    detection_type: str,
    coarse_estimation_type: str,
    ds_name: str,
) -> tuple[str, EvalConfig]:
    """Derive one EvalConfig from the sweep config
    (run_full_megapose_eval.py:71-110)."""
    inference = dataclasses.replace(
        cfg.inference,
        detection_type=detection_type,
        coarse_estimation_type=coarse_estimation_type,
    )
    fields = {f.name for f in dataclasses.fields(EvalConfig)}
    base = {
        k: v for k, v in dataclasses.asdict(cfg).items() if k in fields
    }
    base.pop("inference", None)
    base.pop("hardware", None)
    eval_cfg = EvalConfig(
        **base, inference=inference, hardware=cfg.hardware
    )
    eval_cfg = dataclasses.replace(eval_cfg, ds_name=ds_name)
    if detection_type == "detector":
        assert eval_cfg.detector_run, (
            "detector detection type requires detector_run"
        )
    return generate_save_key(detection_type, coarse_estimation_type), eval_cfg


def run_full_eval(cfg: FullEvalConfig) -> dict:
    """The sweep (run_full_megapose_eval.py:112-188)."""
    assert cfg.detection_coarse_types, "need detection_coarse_types"
    ds_names = cfg.ds_names or BOP_TEST_DATASETS
    assert cfg.save_dir is not None

    bop_eval_cfgs: list[BOPEvalConfig] = []
    all_summaries: dict[str, dict] = {}
    for ds_name in ds_names:
        eval_configs: dict[str, EvalConfig] = {}
        for det_type, coarse_type in cfg.detection_coarse_types:
            name, cfg_ = create_eval_cfg(cfg, det_type, coarse_type, ds_name)
            eval_configs[name] = cfg_

        for save_key, eval_cfg in eval_configs.items():
            if not cfg.skip_inference:
                eval_out = run_eval(eval_cfg)
            else:
                from ..evaluation.eval_config import get_save_dir

                results_dir = get_save_dir(eval_cfg)
                eval_out = {
                    "results_path": results_dir / "results.npz",
                    "pred_keys": ["final"],
                    "save_dir": results_dir,
                    "summary": {},
                }
                assert Path(eval_out["results_path"]).is_file()
            all_summaries[f"{ds_name}/{save_key}"] = eval_out["summary"]
            save_eval_config(
                eval_cfg, Path(eval_out["save_dir"]) / "eval_config.json"
            )

            if cfg.run_bop_eval and cfg.rank == 0 and "bop19" in ds_name:
                # The reference scores 'refiner/final' and 'depth_refiner'
                # (run_full_megapose_eval.py:160-180); 'final' is this
                # repo's name for the former.
                for method in set(("final", "depth_refiner")).intersection(
                    eval_out["pred_keys"]
                ):
                    bop_eval_cfgs.append(
                        BOPEvalConfig(
                            results_path=str(eval_out["results_path"]),
                            dataset=ds_name,
                            split="test",
                            eval_dir=str(
                                Path(eval_out["save_dir"]) / "bop_evaluation"
                            ),
                            method=method,
                        )
                    )

    if cfg.rank == 0 and cfg.run_bop_eval:
        for bop_cfg in bop_eval_cfgs:
            ds_short = bop_cfg.dataset.split(".")[0]
            csv = Path(bop_cfg.results_path).parent / f"{ds_short}.csv"
            result = run_bop_evaluation(
                csv,
                bop_cfg.eval_dir,
                bop_toolkit_dir=cfg.bop_toolkit_dir or None,
                dummy=cfg.debug,
            )
            if result is not None:
                logger.info(f"bop_toolkit rc={result.returncode}")

    out_dir = Path(cfg.save_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "all_summaries.json").write_text(
        json.dumps(all_summaries, indent=2, default=str)
    )
    logger.info(f"wrote {out_dir / 'all_summaries.json'}")
    return all_summaries


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    from .run_eval import normalize_argv

    cfg = apply_eval_overrides(FullEvalConfig(), normalize_argv(argv))
    if cfg.save_dir is None:
        cfg = dataclasses.replace(cfg, save_dir="full_eval")
    return run_full_eval(cfg)


if __name__ == "__main__":
    main()
