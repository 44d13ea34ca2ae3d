"""Worker for the real 2-process distributed test (run via subprocess).

Exercises the full `parallel/distributed.py` surface with world_size > 1 —
the coverage the reference only had as a SLURM smoke test
(megapose6d: src/megapose/scripts/test_distributed.py:38-51,
utils/distributed.py:48-154). Each rank:

  1. `init_distributed_mode()` from COORDINATOR_ADDRESS/WORLD_SIZE/RANK;
  2. all-reduces a metrics dict (`reduce_dict`);
  3. runs one jitted global-mesh collective (psum over both processes);
  4. takes its `shard_frames` slice of a synthetic prediction table and
     `gather_collections` — rank 0 writes the gathered result to JSON for
     the pytest parent to compare against the single-process answer.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # one CPU device per process

import numpy as np  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")

    from megapose6d_tpu.parallel.distributed import (
        gather_collections,
        init_distributed_mode,
        reduce_dict,
    )

    rank, world = init_distributed_mode()
    assert world == int(os.environ["WORLD_SIZE"]), (world, rank)

    # --- metric all-reduce -------------------------------------------
    red = reduce_dict({"loss": float(rank + 1), "acc": 0.5})
    assert abs(red["loss"] - (world + 1) / 2) < 1e-6, red
    assert abs(red["acc"] - 0.5) < 1e-6, red

    # --- one global-mesh collective (scripts/test_distributed.py) ----
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = len(jax.devices())
    assert n == world  # 1 CPU device per process
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    x = jax.device_put(
        jnp.arange(n, dtype=jnp.float32), NamedSharding(mesh, P("dp"))
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(x)
    assert float(total) == n * (n - 1) / 2

    # --- sharded predictions + ragged gather -------------------------
    import pandas as pd

    from megapose6d_tpu.data.tensor_collection import PandasTensorCollection
    from megapose6d_tpu.evaluation.runner import shard_frames

    n_frames = 7  # odd => ragged shards (4 vs 3)
    ids = shard_frames(n_frames, rank, world)
    local = PandasTensorCollection(
        pd.DataFrame(
            {"frame_id": ids, "label": [f"obj_{i}" for i in ids]}
        ),
        poses=np.stack([np.eye(4, dtype=np.float32) * (i + 1) for i in ids]),
        scores=np.asarray(ids, np.float32) / 10.0,
    )
    gathered = gather_collections(local)

    if rank == 0:
        assert gathered is not None
        rec = {
            "world": world,
            "frame_ids": gathered.infos["frame_id"].tolist(),
            "labels": gathered.infos["label"].tolist(),
            "scores": np.asarray(gathered.scores).tolist(),
            "pose_diag0": np.asarray(gathered.poses)[:, 0, 0].tolist(),
        }
        with open(out_path, "w") as f:
            json.dump(rec, f)
    else:
        assert gathered is None

    print(f"rank {rank}/{world} OK", flush=True)


if __name__ == "__main__":
    main()
