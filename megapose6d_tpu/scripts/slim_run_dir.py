"""Slim a training run dir for commit: keep ONLY the latest checkpoint,
re-saved without optimizer state (params + step, ~1/3 the bytes).

The artifact policy (ADVICE r4) commits final checkpoints only; a full
`save_checkpoint` carries the optax state (`training/train.py:314-333`),
which resume needs but published evidence does not — `load_checkpoint`'s
params+step fallback (train.py:400-408) and the `params_only=True` path
both restore a slimmed dir. Intermediate `epoch_*` dirs are deleted.

Usage:
    python -m megapose6d_tpu.scripts.slim_run_dir runs/refiner_dr [...]
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path


def slim_run_dir(run_dir: str | Path) -> None:
    import orbax.checkpoint as ocp

    run_dir = Path(run_dir)
    ckpt_dir = run_dir / "checkpoints"
    latest = ckpt_dir / "latest.txt"
    assert latest.exists(), f"no latest.txt under {ckpt_dir}"
    tag = latest.read_text().strip()
    # demo_long_* runs name checkpoints epoch_<N>; run_detector_training
    # names them step_<N> and also writes a params-only `final`.
    path = next(
        p for p in (ckpt_dir / f"epoch_{tag}", ckpt_dir / f"step_{tag}")
        if p.exists()
    )
    import jax
    import numpy as np

    ckptr = ocp.PyTreeCheckpointer()
    # Restore every leaf as host numpy (a TPU-saved checkpoint must slim
    # on CPU without the device topology it was saved under).
    meta = ckptr.metadata(str(path.absolute()))
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    restored = ckptr.restore(
        str(path.absolute()),
        args=ocp.args.PyTreeRestore(restore_args=restore_args),
    )
    slim = {"params": restored["params"]}
    if "step" in restored:
        slim["step"] = restored["step"]
    tmp = ckpt_dir / f"_slim_{path.name}"
    if tmp.exists():
        shutil.rmtree(tmp)
    saver = ocp.StandardCheckpointer()
    saver.save(tmp.absolute(), slim, force=True)
    saver.wait_until_finished()
    before = sum(f.stat().st_size for f in path.rglob("*") if f.is_file())
    after = sum(f.stat().st_size for f in tmp.rglob("*") if f.is_file())
    shutil.rmtree(path)
    tmp.rename(path)
    # Drop every other epoch/step dir (keep `final`: it is already
    # params-only and eval loaders resolve it by name).
    for p in ckpt_dir.iterdir():
        if p.is_dir() and p != path and p.name != "final":
            shutil.rmtree(p)
    print(
        f"{run_dir}: kept {path.name} "
        f"({before / 1e6:.0f} MB -> {after / 1e6:.0f} MB), "
        f"dropped intermediates"
    )


if __name__ == "__main__":
    for d in sys.argv[1:]:
        slim_run_dir(d)
