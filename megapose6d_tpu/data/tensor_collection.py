"""TensorCollection / PandasTensorCollection — the batch currency.

API-compatible re-design of the reference's `utils/tensor_collection.py`
(megapose6d: src/megapose/utils/tensor_collection.py:45-197): a bundle of
same-leading-dim arrays plus an aligned `pandas.DataFrame` of per-row
metadata. In the TPU framework these live only at the *edges* (detections in,
pose estimates out, eval bookkeeping); the jitted core works on plain padded
arrays. Registered as a jax pytree with `infos` as static aux data so it can
still cross a jit boundary when convenient.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
import pandas as pd


class PandasTensorCollection:
    """Arrays (numpy or jax, shared leading dim) + aligned DataFrame."""

    def __init__(self, infos: pd.DataFrame, **tensors: Any):
        self.infos = infos.reset_index(drop=True)
        self.tensors: dict[str, Any] = {}
        for k, v in tensors.items():
            self.register_tensor(k, v)

    def register_tensor(self, name: str, tensor: Any) -> None:
        assert len(tensor) == len(self.infos), (
            name,
            len(tensor),
            len(self.infos),
        )
        self.tensors[name] = tensor
        # Attribute access like the reference (tensor_collection.py:75-82).
        object.__setattr__(self, name, tensor)

    def __len__(self) -> int:
        return len(self.infos)

    def __getitem__(self, ids) -> "PandasTensorCollection":
        ids = np.asarray(ids)
        if ids.dtype == bool:
            ids = np.nonzero(ids)[0]
        tensors = {k: v[ids] for k, v in self.tensors.items()}
        return PandasTensorCollection(self.infos.iloc[ids], **tensors)

    def clone(self) -> "PandasTensorCollection":
        return PandasTensorCollection(
            self.infos.copy(),
            **{k: np.array(v) for k, v in self.tensors.items()},
        )

    def numpy(self) -> "PandasTensorCollection":
        return PandasTensorCollection(
            self.infos, **{k: np.asarray(v) for k, v in self.tensors.items()}
        )

    def device(self) -> "PandasTensorCollection":
        import jax.numpy as jnp

        return PandasTensorCollection(
            self.infos, **{k: jnp.asarray(v) for k, v in self.tensors.items()}
        )

    def __repr__(self) -> str:
        lines = [f"PandasTensorCollection(n={len(self)}"]
        for k, v in self.tensors.items():
            lines.append(f"  {k}: {tuple(v.shape)} {v.dtype}")
        lines.append(f"  infos: {list(self.infos.columns)})")
        return "\n".join(lines)


def concatenate(
    collections: list[PandasTensorCollection],
) -> PandasTensorCollection:
    """Row-concatenate (tensor_collection.py:30-42)."""
    assert collections, "empty concatenate"
    infos = pd.concat([c.infos for c in collections], ignore_index=True)
    keys = collections[0].tensors.keys()
    tensors = {
        k: np.concatenate([np.asarray(c.tensors[k]) for c in collections])
        for k in keys
    }
    return PandasTensorCollection(infos, **tensors)


def _flatten(tc: PandasTensorCollection):
    names = sorted(tc.tensors.keys())
    return [tc.tensors[k] for k in names], (names, tc.infos)


def _unflatten(aux, children):
    names, infos = aux
    return PandasTensorCollection(infos, **dict(zip(names, children)))


jax.tree_util.register_pytree_node(
    PandasTensorCollection, _flatten, _unflatten
)
