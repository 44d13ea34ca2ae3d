"""Parallel input pipeline: multiprocessing batch workers + prefetch queue.

TPU-native analog of the reference's `DataLoader(num_workers,
persistent_workers, pin_memory)` with per-worker reseeding (megapose6d:
src/megapose/training/train_megapose.py:170-178, utils/random.py
get_unique_seed). Real webdataset training decodes PNGs and runs PIL
augmentations per sample on the host; a single-threaded Python loop starves
the TPU, so batch construction fans out across worker processes:

  - each worker runs a user-supplied `factory(worker_seed) ->
    Iterator[batch]` (a picklable callable building its own scene-dataset
    iterator + PoseDataset), reseeded per worker;
  - finished batches (numpy pytrees) flow back through a bounded
    `multiprocessing.Queue` — the prefetch buffer;
  - the main process only dequeues and `device_put`s, overlapping host
    decode/augment with device compute.

Workers use the `spawn` start method (never fork a process that may have
initialized a JAX backend) and force `JAX_PLATFORMS=cpu` so a worker can
never grab the TPU.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as queue_lib
import random
from typing import Callable, Iterator, Optional

import numpy as np


def _worker_main(factory, worker_seed: int, out_q, stop_event) -> None:
    # Spawned child: make sure any jax use stays on host CPU — a dataloader
    # worker must never claim the TPU. The env var alone is not enough when
    # a sitecustomize hook overrides it at interpreter startup, so also pin
    # the platform at jax-config level before first backend use.
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass
    random.seed(worker_seed)
    np.random.seed(worker_seed % (2**32))
    try:
        it = factory(worker_seed)
        while not stop_event.is_set():
            batch = next(it)
            while not stop_event.is_set():
                try:
                    out_q.put(batch, timeout=0.5)
                    break
                except queue_lib.Full:
                    continue
    except (KeyboardInterrupt, BrokenPipeError, EOFError):
        pass


class ParallelBatchLoader:
    """Infinite batch iterator backed by worker processes.

    Args:
      factory: picklable `worker_seed -> Iterator[batch]`. With
        `n_workers == 0` it runs inline in the calling process (the
        reference's `num_workers=0` semantics).
      n_workers: number of persistent worker processes.
      seed: base seed; worker i gets `seed + 1000003 * (i + 1)`.
      prefetch: queue capacity (batches buffered ahead of the consumer).
    """

    def __init__(
        self,
        factory: Callable[[int], Iterator],
        n_workers: int = 4,
        seed: int = 0,
        prefetch: int = 8,
    ):
        self.factory = factory
        self.n_workers = int(n_workers)
        self.seed = int(seed)
        self.prefetch = max(2, int(prefetch))
        self._procs: list[mp.Process] = []
        self._queue = None
        self._stop = None
        self._inline_iter: Optional[Iterator] = None

    # ------------------------------------------------------------------

    def start(self) -> "ParallelBatchLoader":
        if self.n_workers == 0:
            self._inline_iter = self.factory(self.seed)
            return self
        if self._procs:
            return self
        # Warm the native decoder build in the parent so spawned workers
        # dlopen the cached .so instead of each racing a g++ compile.
        from .. import native

        native.available()
        ctx = mp.get_context("spawn")
        self._queue = ctx.Queue(maxsize=self.prefetch)
        self._stop = ctx.Event()
        for i in range(self.n_workers):
            p = ctx.Process(
                target=_worker_main,
                args=(
                    self.factory,
                    self.seed + 1000003 * (i + 1),
                    self._queue,
                    self._stop,
                ),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
        return self

    def __iter__(self) -> Iterator:
        self.start()
        if self._inline_iter is not None:
            yield from self._inline_iter
            return
        while True:
            try:
                yield self._queue.get(timeout=300.0)  # worker cold-start imports jax
            except queue_lib.Empty:
                dead = [p for p in self._procs if not p.is_alive()]
                if dead:
                    codes = [p.exitcode for p in dead]
                    raise RuntimeError(
                        f"{len(dead)} dataloader worker(s) died "
                        f"(exitcodes {codes})"
                    ) from None
                raise

    def close(self) -> None:
        if self._stop is not None:
            self._stop.set()
        # Drain so workers blocked on put() can observe the stop event.
        if self._queue is not None:
            try:
                while True:
                    self._queue.get_nowait()
            except queue_lib.Empty:
                pass
        for p in self._procs:
            p.join(timeout=5.0)
            if p.is_alive():
                p.terminate()
        if self._queue is not None:
            self._queue.close()
            self._queue.cancel_join_thread()
        self._procs = []
        self._queue = None
        self._stop = None

    def __enter__(self) -> "ParallelBatchLoader":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# The training batch factory (picklable; built from config primitives only).
# ---------------------------------------------------------------------------


class PoseBatchFactory:
    """Picklable `worker_seed -> Iterator[BatchPoseData]` for scene datasets.

    Each worker constructs its OWN dataset readers (tarfile handles and
    feather indexes are not shareable across processes) from the dataset
    name strings, then runs decode -> augment -> sample -> collate, exactly
    the per-worker work the reference's DataLoader performs
    (train_megapose.py:170-178).
    """

    def __init__(
        self,
        dataset_names: tuple[str, ...],
        labels: tuple[str, ...],
        batch_size: int,
        resize: tuple[int, int],
        input_depth: bool = False,
        min_area: float | None = None,
        apply_rgb_augmentation: bool = True,
        data_dir: str | None = None,
    ):
        self.dataset_names = tuple(dataset_names)
        self.labels = tuple(labels)
        self.batch_size = int(batch_size)
        self.resize = tuple(resize)
        self.input_depth = bool(input_depth)
        self.min_area = min_area
        self.apply_rgb_augmentation = bool(apply_rgb_augmentation)
        self.data_dir = data_dir

    def __call__(self, worker_seed: int):
        from .datasets_cfg import make_scene_dataset
        from .pose_dataset import PoseDataset
        from .scene_dataset import (
            IterableMultiSceneDataset,
            RandomIterableSceneDataset,
        )

        scene_iters = [
            RandomIterableSceneDataset(
                make_scene_dataset(
                    n, load_depth=self.input_depth, data_dir=self.data_dir
                ),
                seed=worker_seed,
            )
            for n in self.dataset_names
        ]
        obs_iter = iter(
            IterableMultiSceneDataset(scene_iters, seed=worker_seed)
        )
        pose_ds = PoseDataset(
            None,
            resize=self.resize,
            apply_rgb_augmentation=self.apply_rgb_augmentation,
            apply_depth_augmentation=self.input_depth,
            depth_supported=self.input_depth,
            min_area=self.min_area,
            keep_labels_set=set(self.labels),
        )
        label_to_idx = {l: i for i, l in enumerate(self.labels)}
        return pose_ds.iter_batches(obs_iter, self.batch_size, label_to_idx)
