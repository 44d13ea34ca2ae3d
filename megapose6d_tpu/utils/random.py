"""Seeding helpers (utils/random.py analog).

JAX is functionally seeded; these helpers seed the HOST-side RNGs used by
dataloader workers / augmentations (the reference reseeds every dataloader
worker from pid/time/urandom, train_megapose.py:71-72)."""

from __future__ import annotations

import os
import random
import time

import numpy as np


def get_unique_seed() -> int:
    return (
        os.getpid()
        ^ int(time.time() * 1e6)
        ^ int.from_bytes(os.urandom(4), "little")
    ) % (2**31)


def seed_everything(seed: int | None = None) -> int:
    seed = get_unique_seed() if seed is None else seed
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed
