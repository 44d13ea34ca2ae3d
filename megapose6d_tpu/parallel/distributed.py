"""Multi-host distributed helpers.

Re-design of the reference's `utils/distributed.py:48-154`: NCCL process
groups + shared-filesystem side channels become `jax.distributed` +
XLA collectives over ICI/DCN:
  - `init_distributed_mode` -> `jax.distributed.initialize` from env
    (JAX coordinates its own rendezvous; no MASTER_ADDR plumbing).
  - `reduce_dict` (metric all-reduce, distributed.py:106-134) ->
    `process_allgather` mean.
  - file-based `gather_distributed` of predictions
    (tensor_collection.py:165-186) -> `gather_collections`: fixed-shape
    tensors ride `process_allgather`; ragged pandas metadata is gathered
    host-side (each process contributes its rows, ordered by rank).
"""

from __future__ import annotations

import numpy as np

import jax

from ..data.tensor_collection import PandasTensorCollection, concatenate


def init_distributed_mode() -> tuple[int, int]:
    """Initialize multi-process JAX from standard cluster env vars.

    Returns (process_index, process_count). Single-process if no
    coordinator is configured. When `COORDINATOR_ADDRESS` is set,
    `WORLD_SIZE`/`RANK` (the reference's torchrun-style vars,
    utils/distributed.py:48-77) are forwarded explicitly if present;
    otherwise JAX's cluster auto-detection (SLURM/OMPI) takes over.
    """
    import os

    addr = os.environ.get("COORDINATOR_ADDRESS")
    if addr and "WORLD_SIZE" in os.environ and "RANK" in os.environ:
        # Must run before any JAX backend touch (jax.devices() etc.).
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["WORLD_SIZE"]),
            process_id=int(os.environ["RANK"]),
        )
    elif addr:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def reduce_dict(metrics: dict[str, float], average: bool = True) -> dict:
    """All-reduce a metrics dict across processes
    (utils/distributed.py:106-134)."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics.keys())
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(vec)  # [P, K]
    red = gathered.mean(0) if average else gathered.sum(0)
    return {k: float(v) for k, v in zip(keys, red)}


def gather_collections(
    tc: PandasTensorCollection,
) -> PandasTensorCollection | None:
    """Gather per-process prediction collections to process 0.

    Fixed-shape replacement for the reference's torch.save-on-shared-FS
    gather (tensor_collection.py:gather_distributed:165-186): tensors are
    padded to the max row count and allgathered; infos are serialized to
    JSON rows and allgathered as bytes.
    """
    if jax.process_count() == 1:
        return tc
    from jax.experimental import multihost_utils

    n_local = len(tc)
    counts = multihost_utils.process_allgather(
        np.asarray([n_local], np.int32)
    ).reshape(-1)
    n_max = int(counts.max())

    parts = {}
    for name, arr in tc.tensors.items():
        arr = np.asarray(arr)
        pad = np.zeros((n_max - len(arr),) + arr.shape[1:], arr.dtype)
        parts[name] = multihost_utils.process_allgather(
            np.concatenate([arr, pad], axis=0)
        )  # [P, n_max, ...]

    # Ragged JSON payloads: allgather the per-process byte counts first and
    # size the gather buffer to the global max (no fixed cap — a real BOP
    # eval shard is thousands of rows and easily exceeds 1 MB).
    payload = tc.infos.to_json(orient="records").encode()
    sizes = multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64)
    ).reshape(-1)
    buf = np.zeros(max(int(sizes.max()), 1), np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    infos_all = multihost_utils.process_allgather(buf)  # [P, buf]

    if jax.process_index() != 0:
        return None

    import pandas as pd

    collections = []
    for p in range(jax.process_count()):
        n_p = int(counts[p])
        if n_p == 0:
            continue
        import io

        infos_p = pd.read_json(
            io.StringIO(bytes(infos_all[p, : sizes[p]]).decode()),
            orient="records",
        )
        tensors_p = {k: v[p, :n_p] for k, v in parts.items()}
        collections.append(PandasTensorCollection(infos_p, **tensors_p))
    return concatenate(collections)
