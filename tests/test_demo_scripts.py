"""Smoke tests for the round-2 demo scripts (tiny shapes, CPU):
demo_long_refiner trains + evals + checkpoints, and
demo_finalize_pipeline consumes its checkpoint to run the full pipeline.
"""

import json

import pytest


@pytest.mark.slow
def test_demo_long_then_finalize(tmp_path, monkeypatch):
    from megapose6d_tpu.scripts import demo_finalize_pipeline, demo_long_refiner

    long_dir = tmp_path / "long"
    rec = demo_long_refiner.main(
        [
            f"out_dir={long_dir}",
            "n_steps=2",
            "batch_size=2",
            "eval_every=2",
            "ckpt_every=2",
            "render=48,64",
            "n_eval=2",
            "refine_iters=1",
            "backbone=resnet18-spatial",
        ]
    )
    assert (long_dir / "report.json").exists()
    hist = json.loads((long_dir / "history.json").read_text())
    assert hist and hist[-1]["step"] == 2
    assert rec["rot_init_deg"] > 0
    assert (long_dir / "checkpoints" / "latest.txt").read_text() == "2"

    out = tmp_path / "final"
    report = demo_finalize_pipeline.main(
        [
            f"refiner_dir={long_dir}",
            f"out_dir={out}",
            "coarse_steps=2",
            "so3=8",
            "n_eval=1",
            "refine_iters=1",
            "render=48,64",
            "batch_size=2",
            "backbone=resnet18-spatial",
        ]
    )
    assert report["refiner_checkpoint_step"] == 2
    for k in ("init", "refined", "pipeline"):
        assert "rot_deg" in report[k]
    assert (out / "report.json").exists()
