"""End-to-end BOP evaluation stack on generated data (VERDICT round-1 item:
generate a BOP-layout dataset, run the full eval path — BOPDataset ->
PredictionRunner -> BOP CSV -> meters — as ONE pipeline).

Reference flow: run_full_megapose_eval.py:112-188."""

import json

import numpy as np
import pytest

import megapose6d_tpu.config as mp_config
from megapose6d_tpu.data.bop_scene_dataset import (
    BOPDataset,
    load_bop_object_dataset,
)
from megapose6d_tpu.evaluation.bop import load_bop_results
from megapose6d_tpu.meshes.mesh_db import MeshDataBase
from megapose6d_tpu.scripts.generate_synthetic_dataset import (
    _default_objects,
    generate_bop,
)

RES = (96, 128)


@pytest.fixture(scope="module")
def bop_ds_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop_root")
    objects = _default_objects()
    mesh_db = MeshDataBase.from_object_ds(
        objects, max_faces=256, n_points=128, n_sym=2
    ).batched(align=32)
    generate_bop(
        mesh_db,
        objects,
        root / "synth",
        n_frames=4,
        resolution=RES,
        n_obj_per_scene=2,
        f=140.0,
        frames_per_scene=2,
        seed=0,
    )
    return root


def test_bop_writer_reader_roundtrip(bop_ds_dir):
    ds = BOPDataset(bop_ds_dir / "synth", split="test")
    assert len(ds) == 4
    obs = ds[1]
    assert obs.rgb.shape == RES + (3,)
    assert obs.camera_data.K[0, 0] == pytest.approx(140.0)
    gts = obs.gt_detections()
    assert 1 <= len(gts) <= 2
    labels_all = ("obj_000001", "obj_000002", "obj_000003", "obj_000004")
    for g in gts:
        assert g.label in labels_all
        x0, y0, x1, y1 = g.bbox_modal
        assert 0 <= x0 < x1 <= RES[1] and 0 <= y0 < y1 <= RES[0]
        # Object in front of the camera, ~0.5-1.2 m away.
        assert 0.3 < g.TWO[2, 3] < 1.5
    assert obs.segmentation is not None and obs.segmentation.max() >= 1

    objs = load_bop_object_dataset(bop_ds_dir / "synth" / "models")
    assert objs.labels == [
        "obj_000001", "obj_000002", "obj_000003", "obj_000004"
    ]
    cube = objs.get_object_by_label("obj_000001").load()
    # cube(half=0.04): diagonal = 0.08 * sqrt(3) m (models stored in mm).
    assert cube.diameter() == pytest.approx(0.08 * 3**0.5, rel=0.05)


@pytest.mark.slow
def test_run_eval_end_to_end(bop_ds_dir, tmp_path, monkeypatch):
    """The full CLI path on the generated dataset, random-weight models
    (contract-level: CSV + summary written, AR keys present). Exercises
    the legacy round-2 CLI aliases on the structured-config driver."""
    monkeypatch.setattr(mp_config, "BOP_DS_DIR", bop_ds_dir)
    from megapose6d_tpu.scripts import run_eval

    out = tmp_path / "eval_out"
    summary = run_eval.main(
        [
            "dataset=synth.bop19",
            f"out_dir={out}",
            "n_frames=2",
            "so3_grid_size=8",
            "n_refiner_iterations=1",
            "n_pose_hypotheses=1",
            "max_detections=2",
            "render_size=48,64",
            "max_faces=256",
            "load_depth=1",
        ]
    )
    # Reference save-dir layout: <save_dir>/<ds_name>/<detection>+<coarse>
    out = out / "synth.bop19" / "gt+SO3_grid"
    rows = load_bop_results(out / "synth.csv")
    assert len(rows) >= 2
    for r in rows:
        assert r["obj_id"] in (1, 2, 3, 4)
        assert r["scene_id"] == 0
        assert np.isfinite(r["R"]).all() and np.isfinite(r["t"]).all()
        # t in millimeters (z was 0.5-1.2 m).
        assert 200 < r["t"][2] < 2000

    assert "bop" in summary and "modelnet" in summary
    bop = summary["bop"]
    keys_lower = [k.lower() for k in bop]
    assert any("mssd" in k for k in keys_lower)
    assert any("mspd" in k for k in keys_lower)
    assert any("vsd" in k for k in keys_lower)
    assert "AR" in bop  # BOP19 AR triple average
    saved = json.loads((out / "summary.json").read_text())
    assert saved.keys() == summary.keys()
    # Stage-keyed predictions persisted and loadable (results.pth.tar
    # analog, reference evaluation.py:208-222).
    from megapose6d_tpu.evaluation.evaluation import load_predictions

    preds = load_predictions(out / "results.npz")
    assert "final" in preds and len(preds["final"]) >= 2
    assert "refiner/iteration=1" in preds
    assert preds["final"].poses.shape[-2:] == (4, 4)


def test_eval_config_overrides_and_save_key():
    """Structured eval configs (reference eval_config.py:42-105) +
    dotlist overrides + save-key naming."""
    import dataclasses

    from megapose6d_tpu.evaluation.eval_config import (
        EvalConfig,
        FullEvalConfig,
        apply_eval_overrides,
        generate_save_key,
        get_save_dir,
    )

    cfg = apply_eval_overrides(
        FullEvalConfig(),
        [
            "ds_names=synth.bop19,ycbv.bop19",
            "detection_coarse_types=gt:SO3_grid,detector:SO3_grid",
            "save_dir=/tmp/x",
            "inference.SO3_grid_size=72",
            "inference.detection_type=detector",
            "hardware.n_chips=4",
            "n_frames=3",
            "render_size=48,64",
        ],
    )
    assert cfg.ds_names == ["synth.bop19", "ycbv.bop19"]
    assert cfg.detection_coarse_types == [
        ("gt", "SO3_grid"),
        ("detector", "SO3_grid"),
    ]
    assert cfg.inference.SO3_grid_size == 72
    assert cfg.hardware.n_chips == 4
    assert cfg.n_frames == 3
    assert cfg.render_size == (48, 64)
    assert generate_save_key("gt", "SO3_grid") == "gt+SO3_grid"
    ecfg = dataclasses.replace(
        EvalConfig(), save_dir="/tmp/x", ds_name="ycbv.bop19"
    )
    assert str(get_save_dir(ecfg)).endswith("/tmp/x/ycbv.bop19/gt+SO3_grid")


@pytest.mark.slow
def test_run_full_eval_sweep(bop_ds_dir, tmp_path, monkeypatch):
    """The dataset x (detection, coarse) sweep driver writes
    reference-shaped per-config dirs + all_summaries.json
    (run_full_megapose_eval.py:112-188)."""
    monkeypatch.setattr(mp_config, "BOP_DS_DIR", bop_ds_dir)
    from megapose6d_tpu.scripts import run_full_eval

    out = tmp_path / "sweep"
    summaries = run_full_eval.main(
        [
            "ds_names=synth.bop19",
            f"save_dir={out}",
            "detection_coarse_types=gt:SO3_grid",
            "n_frames=1",
            "inference.SO3_grid_size=8",
            "inference.n_refiner_iterations=1",
            "inference.n_pose_hypotheses=1",
            "inference.max_detections=2",
            "render_size=48,64",
            "max_faces=256",
        ]
    )
    assert "synth.bop19/gt+SO3_grid" in summaries
    cfg_dir = out / "synth.bop19" / "gt+SO3_grid"
    assert (cfg_dir / "results.npz").exists()
    assert (cfg_dir / "synth.csv").exists()
    assert (cfg_dir / "eval_config.json").exists()
    assert json.loads(
        (out / "all_summaries.json").read_text()
    ).keys() == summaries.keys()
