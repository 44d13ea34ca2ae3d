"""Multi-dataset BOP evaluation driver.

Re-design of the reference's `scripts/run_full_megapose_eval.py:112-188`:
loops the BOP19 dataset list, runs predictions + CSV conversion per
dataset, then (rank 0, when bop_toolkit is available) launches official
scoring subprocesses.

Usage:
    python -m megapose6d_tpu.scripts.run_full_eval \\
        datasets=ycbv,lmo,tless coarse_run=... refiner_run=... \\
        out_dir=full_eval [n_frames=0] [bop_toolkit_dir=...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from ..evaluation.bop import run_bop_evaluation
from ..utils.logging import get_logger
from . import run_eval

logger = get_logger(__name__)

BOP19_TEST_DATASETS = ["lmo", "tless", "tudl", "icbin", "itodd", "hb", "ycbv"]


def main(argv=None):
    args = dict(
        datasets=",".join(BOP19_TEST_DATASETS),
        coarse_run="",
        refiner_run="",
        out_dir="full_eval",
        n_frames="0",
        rank="0",
        world_size="1",
        bop_toolkit_dir="",
        dummy="0",
    )
    for a in sys.argv[1:] if argv is None else argv:
        k, _, v = a.partition("=")
        assert k in args, f"unknown arg {k}"
        args[k] = v

    out_dir = Path(args["out_dir"])
    summaries = {}
    for ds in args["datasets"].split(","):
        ds = ds.strip()
        logger.info(f"=== evaluating {ds} ===")
        ds_out = out_dir / ds
        summary = run_eval.main(
            [
                f"dataset={ds}.bop19",
                f"coarse_run={args['coarse_run']}",
                f"refiner_run={args['refiner_run']}",
                f"out_dir={ds_out}",
                f"n_frames={args['n_frames']}",
                f"rank={args['rank']}",
                f"world_size={args['world_size']}",
            ]
        )
        summaries[ds] = summary
        if args["rank"] == "0" and args["bop_toolkit_dir"]:
            result = run_bop_evaluation(
                ds_out / f"{ds}.csv",
                ds_out / "bop_eval",
                bop_toolkit_dir=args["bop_toolkit_dir"],
                dummy=args["dummy"] == "1",
            )
            if result is not None:
                logger.info(f"bop_toolkit rc={result.returncode}")

    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "all_summaries.json").write_text(
        json.dumps(summaries, indent=2, default=str)
    )
    logger.info(f"wrote {out_dir / 'all_summaries.json'}")


if __name__ == "__main__":
    main()
