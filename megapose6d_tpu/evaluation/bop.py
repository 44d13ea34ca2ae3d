"""BOP-challenge output bridge: bit-compatible results CSV + toolkit runner.

Re-design of the reference's `evaluation/bop.py:100-218`. The CSV contract
(`save_bop_results` format: scene_id,im_id,obj_id,score,R,t,time with R
row-major space-separated and t in millimeters) is reproduced exactly so
bop_toolkit's eval_bop19.py consumes our predictions unchanged. The VSD/
MSSD/MSPD scoring itself stays a CPU subprocess (gated on bop_toolkit being
installed), as in the reference.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import numpy as np

from ..data.tensor_collection import PandasTensorCollection


def label_to_obj_id(label: str) -> int:
    """BOP convention: 'obj_000014' / 'ycbv-obj_000002' -> 14 / 2.

    The reference parses `int(label.split("_")[-1])` and crashes on labels
    without a numeric suffix; here non-BOP labels raise a clear error unless
    the caller provides an explicit mapping to `convert_results_to_bop`.
    """
    tail = str(label).split("_")[-1]
    if not tail.lstrip("-").isdigit():
        raise ValueError(
            f"label {label!r} has no numeric obj_id suffix; pass "
            "obj_id_map={label: id} to convert_results_to_bop"
        )
    return int(tail)


def convert_results_to_bop(
    predictions: PandasTensorCollection,
    out_csv_path: str | Path,
    use_pose_score: bool = True,
    obj_id_map: dict[str, int] | None = None,
) -> Path:
    """PoseEstimates -> BOP19 CSV (evaluation/bop.py:100-138).

    `predictions.infos` must carry scene_id, view_id, label (+ scores);
    `predictions.poses` is `[N, 4, 4]` in meters. `obj_id_map` overrides the
    BOP `obj_NNNNNN` label convention for datasets with free-form labels.
    """
    rows = []
    poses = np.asarray(predictions.poses)
    for n in range(len(predictions)):
        info = predictions.infos.iloc[n]
        T = poses[n]
        R = T[:3, :3]
        t = T[:3, 3] * 1e3  # m -> mm
        if obj_id_map is not None:
            obj_id = int(obj_id_map[str(info["label"])])
        else:
            obj_id = label_to_obj_id(info["label"])
        score = info["pose_score"] if use_pose_score and "pose_score" in info else info.get("score", 1.0)
        time = info["time"] if "time" in info else -1
        rows.append(
            "{scene_id},{im_id},{obj_id},{score},{R},{t},{time}".format(
                scene_id=int(info["scene_id"]),
                im_id=int(info["view_id"]),
                obj_id=obj_id,
                score=float(score),
                R=" ".join(f"{x:.8f}" for x in R.reshape(-1)),
                t=" ".join(f"{x:.8f}" for x in t),
                time=float(time),
            )
        )
    out = Path(out_csv_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(
        "scene_id,im_id,obj_id,score,R,t,time\n" + "\n".join(rows) + "\n"
    )
    return out


def load_bop_results(csv_path: str | Path) -> list[dict]:
    """Parse a BOP results CSV back (for tests / round-trips)."""
    lines = Path(csv_path).read_text().strip().splitlines()
    out = []
    for line in lines[1:]:
        sc, im, obj, score, R, t, time = line.split(",")
        out.append(
            dict(
                scene_id=int(sc),
                im_id=int(im),
                obj_id=int(obj),
                score=float(score),
                R=np.fromstring(R, sep=" ").reshape(3, 3),
                t=np.fromstring(t, sep=" "),
                time=float(time),
            )
        )
    return out


def run_bop_evaluation(
    filename: str | Path,
    eval_dir: str | Path,
    bop_toolkit_dir: str | Path | None = None,
    dummy: bool = False,
) -> subprocess.CompletedProcess | None:
    """Launch bop_toolkit eval as a subprocess
    (evaluation/bop.py:_run_bop_evaluation:140-176). Returns None when the
    toolkit isn't available (zero-egress environments)."""
    if bop_toolkit_dir is None:
        return None
    script = (
        Path(bop_toolkit_dir)
        / "scripts"
        / ("eval_bop19_dummy.py" if dummy else "eval_bop19.py")
    )
    if not script.exists():
        return None
    cmd = [
        sys.executable,
        str(script),
        "--renderer_type",
        "cpp",
        "--results_path",
        str(Path(filename).parent),
        "--eval_path",
        str(eval_dir),
        "--result_filenames",
        Path(filename).name,
    ]
    return subprocess.run(cmd, capture_output=True, text=True)
