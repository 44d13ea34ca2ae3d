"""Object registry + padded on-device mesh database.

TPU-native re-design of the reference's `RigidObject(Dataset)` and
`MeshDataBase`/`BatchedMeshes` (megapose6d:
src/megapose/datasets/object_dataset.py:35-179,
src/megapose/lib3d/rigid_mesh_database.py:57-200). The reference pads only
loss *points* and symmetries onto the GPU; rendering stays in Panda3D's
scene graph. Here the renderer is an XLA program, so vertices, faces,
normals and colors are all padded to static shapes and live in HBM — one
gather (`select`) assembles the per-hypothesis mesh batch on device.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import symmetries as sym_ops
from .io import (
    TriMesh,
    bake_texture_to_colors,
    load_mesh,
    simplify_vertex_clustering,
)


def _resize_texture(tex: "np.ndarray", size: int) -> "np.ndarray":
    """Resize a [H, W, 3] uint8 texture to [size, size, 3] (PIL bilinear)."""
    if tex.shape[0] == size and tex.shape[1] == size:
        return tex
    from PIL import Image

    img = Image.fromarray(tex).resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)

Array = jax.Array


@dataclasses.dataclass
class RigidObject:
    """One object asset (object_dataset.py:35-138)."""

    label: str
    mesh_path: str | Path | None = None
    mesh: TriMesh | None = None  # pre-loaded alternative to mesh_path
    mesh_units: str = "m"  # "m" | "mm"
    scaling_factor: float = 1.0
    symmetries_discrete: list = dataclasses.field(default_factory=list)
    symmetries_continuous: list = dataclasses.field(default_factory=list)
    ypr_offset_deg: tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def scale(self) -> float:
        return {"m": 1.0, "mm": 0.001}[self.mesh_units] * self.scaling_factor

    def load(self, bake_texture: bool = True) -> TriMesh:
        mesh = self.mesh
        if mesh is None:
            assert self.mesh_path is not None, self.label
            kw = {}
            if Path(self.mesh_path).suffix.lower() == ".obj":
                # Keep per-pixel textures when the consumer asks for them
                # (load_obj otherwise bakes map_Kd to vertex colors).
                kw["bake_texture"] = bake_texture
            mesh = load_mesh(self.mesh_path, **kw)
        mesh = mesh.scaled(self.scale).with_computed_normals()
        if mesh.vertex_colors is None:
            mesh = dataclasses.replace(
                mesh,
                vertex_colors=np.full_like(mesh.vertices, 0.5),
            )
        return mesh


class RigidObjectDataset:
    """Label-indexed collection of objects (object_dataset.py:140-179)."""

    def __init__(self, objects: Sequence[RigidObject]):
        self.objects = list(objects)
        self._by_label = {o.label: o for o in self.objects}
        assert len(self._by_label) == len(self.objects), "duplicate labels"

    def __len__(self) -> int:
        return len(self.objects)

    def __getitem__(self, i: int) -> RigidObject:
        return self.objects[i]

    @property
    def labels(self) -> list[str]:
        return [o.label for o in self.objects]

    def get_object_by_label(self, label: str) -> RigidObject:
        return self._by_label[label]

    def filter_objects(self, keep_labels: set[str]) -> "RigidObjectDataset":
        return RigidObjectDataset(
            [o for o in self.objects if o.label in keep_labels]
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _normalize_winding(mesh: TriMesh) -> TriMesh:
    """Flip all faces if the signed volume is negative, so closed meshes
    are consistently outward-CCW — the precondition for the rasterizer's
    backface culling (camera-facing faces then have negative screen-space
    area; see ops/rasterizer_tiled.py)."""
    import dataclasses as _dc

    v = mesh.vertices[mesh.faces]
    vol = float(
        np.einsum("fi,fi->f", v[:, 0], np.cross(v[:, 1], v[:, 2])).sum()
    )
    if vol < 0:
        mesh = _dc.replace(mesh, faces=mesh.faces[:, [0, 2, 1]])
    return mesh


def _morton_sort_faces(mesh: TriMesh) -> TriMesh:
    """Reorder faces along a 3D Morton curve of their centroids."""
    import dataclasses as _dc

    c = mesh.vertices[mesh.faces].mean(axis=1)  # [F, 3]
    lo, hi = c.min(0), c.max(0)
    q = ((c - lo) / np.maximum(hi - lo, 1e-12) * 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    order = np.argsort(code, kind="stable")
    return _dc.replace(mesh, faces=mesh.faces[order])


@struct.dataclass
class BatchedMeshes:
    """Padded per-label mesh arrays on device; a registered pytree.

    Axis 0 is the label axis (L). Select per-hypothesis meshes with
    `select(idx)` (analog of `BatchedMeshes.select`,
    rigid_mesh_database.py:133-155). Padding conventions:
      - vertices/normals/colors padded with the last valid vertex,
      - faces padded with (0, 0, 0) — degenerate, rasterizes to nothing,
      - symmetries padded with identity + `sym_valid` mask,
      - points padded by cyclic repetition (always "valid" for means).
    """

    vertices: Array  # [L, V, 3] f32
    normals: Array  # [L, V, 3] f32
    colors: Array  # [L, V, 3] f32
    faces: Array  # [L, F, 3] i32
    face_valid: Array  # [L, F] bool
    points: Array  # [L, P, 3] f32 (loss/extent point sets)
    symmetries: Array  # [L, S, 4, 4] f32
    sym_valid: Array  # [L, S] bool
    diameters: Array  # [L] f32
    labels: tuple[str, ...] = struct.field(pytree_node=False)
    # Per-pixel texturing (optional; reference capability =
    # panda3d_scene_renderer.py:298-358 textured render). `uvs` are
    # image-convention per-vertex texcoords; `textures` a uint8 atlas
    # (resized square, one slot per label); `has_tex` selects per label
    # whether the rasterizer samples the texture or the baked vertex
    # colors. uint8 keeps HBM cost at L * ts^2 * 3 bytes (e.g. 20k
    # objects at 128^2 = 0.98 GB) — for beyond-HBM object counts see the
    # sharded mesh-DB design.
    uvs: Array | None = None  # [L, V, 2] f32 in [0, 1]
    textures: Array | None = None  # [L, TS, TS, 3] uint8
    has_tex: Array | None = None  # [L] bool

    @property
    def n_labels(self) -> int:
        return self.vertices.shape[0]

    def label_to_index(self, labels: Sequence[str]) -> jnp.ndarray:
        table = {l: i for i, l in enumerate(self.labels)}
        return jnp.asarray([table[l] for l in labels], jnp.int32)

    def select(self, idx: Array) -> "BatchedMeshes":
        """Gather a hypothesis batch `[B, ...]` of meshes by label index."""
        take = lambda a: jnp.take(a, idx, axis=0)
        opt = lambda a: None if a is None else take(a)
        return BatchedMeshes(
            vertices=take(self.vertices),
            normals=take(self.normals),
            colors=take(self.colors),
            faces=take(self.faces),
            face_valid=take(self.face_valid),
            points=take(self.points),
            symmetries=take(self.symmetries),
            sym_valid=take(self.sym_valid),
            diameters=take(self.diameters),
            labels=self.labels,
            uvs=opt(self.uvs),
            textures=opt(self.textures),
            has_tex=opt(self.has_tex),
        )


def save_batched_meshes(path, batched: "BatchedMeshes") -> None:
    """Serialize a padded mesh DB to one .npz (the preprocessing-cache
    analog of the reference's make_* mesh scripts + joblib MEMORY)."""
    arrays = {
        k: np.asarray(getattr(batched, k))
        for k in (
            "vertices", "normals", "colors", "faces", "face_valid",
            "points", "symmetries", "sym_valid", "diameters",
        )
    }
    for k in ("uvs", "textures", "has_tex"):
        v = getattr(batched, k)
        if v is not None:
            arrays[k] = np.asarray(v)
    np.savez_compressed(path, labels=np.asarray(batched.labels), **arrays)


def load_batched_meshes(path) -> "BatchedMeshes":
    data = np.load(path, allow_pickle=False)
    return BatchedMeshes(
        vertices=jnp.asarray(data["vertices"]),
        normals=jnp.asarray(data["normals"]),
        colors=jnp.asarray(data["colors"]),
        faces=jnp.asarray(data["faces"]),
        face_valid=jnp.asarray(data["face_valid"]),
        points=jnp.asarray(data["points"]),
        symmetries=jnp.asarray(data["symmetries"]),
        sym_valid=jnp.asarray(data["sym_valid"]),
        diameters=jnp.asarray(data["diameters"]),
        labels=tuple(str(l) for l in data["labels"]),
        uvs=jnp.asarray(data["uvs"]) if "uvs" in data else None,
        textures=jnp.asarray(data["textures"]) if "textures" in data else None,
        has_tex=jnp.asarray(data["has_tex"]) if "has_tex" in data else None,
    )


class MeshDataBase:
    """Host-side mesh DB; `batched()` produces the device `BatchedMeshes`.

    Analog of `MeshDataBase.from_object_ds(...).batched(...)`
    (rigid_mesh_database.py:57-130), extended to carry faces/normals/colors
    for the on-device rasterizer.
    """

    def __init__(
        self,
        objects: RigidObjectDataset,
        max_faces: int = 4096,
        n_points: int = 2000,
        n_sym: int = 32,
        keep_textures: bool = True,
        texture_size: int = 256,
    ):
        self.objects = objects
        self.max_faces = max_faces
        self.n_points = n_points
        self.n_sym = n_sym
        self.keep_textures = keep_textures
        self.texture_size = texture_size
        self.meshes: dict[str, TriMesh] = {}
        self._sym_poses: dict[str, np.ndarray] = {}
        for obj in objects.objects:
            mesh = obj.load(bake_texture=not keep_textures)
            if not keep_textures:
                mesh = bake_texture_to_colors(mesh)
            if mesh.n_faces > max_faces:
                # Vertex clustering merges UV seams; bake the texture to
                # vertex colors first (decimated LODs are the coarse-
                # scoring path where silhouettes dominate anyway).
                mesh = simplify_vertex_clustering(
                    bake_texture_to_colors(mesh), max_faces
                )
            # Morton-order faces by centroid: the tiled rasterizer skips
            # whole face chunks per screen tile, which needs consecutive
            # faces to be spatially adjacent (ops/rasterizer_tiled.py).
            mesh = _morton_sort_faces(_normalize_winding(mesh))
            self.meshes[obj.label] = mesh
            # Symmetries act on the *scaled* (meters) mesh; units already
            # applied by obj.load(), so scale=1 here for discrete offsets
            # given in the object's native units times obj.scale.
            self._sym_poses[obj.label] = sym_ops.make_symmetries_poses(
                symmetries_discrete=obj.symmetries_discrete,
                symmetries_continuous=obj.symmetries_continuous,
                n_symmetries_continuous=8,
                scale=obj.scale,
            )

    @classmethod
    def from_object_ds(cls, ds: RigidObjectDataset, **kw) -> "MeshDataBase":
        return cls(ds, **kw)

    def batched(
        self,
        align: int = 128,
        n_vertices_pad: int | None = None,
        n_faces_pad: int | None = None,
    ) -> BatchedMeshes:
        """Pack to padded device arrays. `n_vertices_pad`/`n_faces_pad`
        force the pad targets — required when independently-built DBs
        (e.g. per-host label shards of a ShardedMeshDB) must agree on
        array shapes."""
        labels = self.objects.labels
        L = len(labels)
        V = n_vertices_pad or _round_up(
            max(m.n_vertices for m in self.meshes.values()), align
        )
        F = n_faces_pad or _round_up(
            min(
                self.max_faces,
                max(m.n_faces for m in self.meshes.values()),
            ),
            align,
        )
        assert all(m.n_vertices <= V for m in self.meshes.values()), (
            "n_vertices_pad too small"
        )
        assert all(m.n_faces <= F for m in self.meshes.values()), (
            "n_faces_pad too small"
        )
        P = self.n_points
        S = self.n_sym

        verts = np.zeros((L, V, 3), np.float32)
        norms = np.zeros((L, V, 3), np.float32)
        cols = np.zeros((L, V, 3), np.float32)
        faces = np.zeros((L, F, 3), np.int32)
        fvalid = np.zeros((L, F), bool)
        points = np.zeros((L, P, 3), np.float32)
        syms = np.tile(np.eye(4, dtype=np.float32), (L, S, 1, 1))
        svalid = np.zeros((L, S), bool)
        diam = np.zeros((L,), np.float32)

        any_tex = any(
            m.texture is not None and m.vertex_uvs is not None
            for m in self.meshes.values()
        )
        TS = self.texture_size
        uvs = np.zeros((L, V, 2), np.float32) if any_tex else None
        texs = np.zeros((L, TS, TS, 3), np.uint8) if any_tex else None
        htex = np.zeros((L,), bool) if any_tex else None

        rng = np.random.RandomState(0)
        for i, label in enumerate(labels):
            m = self.meshes[label]
            nv, nf = m.n_vertices, m.n_faces
            verts[i, :nv] = m.vertices
            verts[i, nv:] = m.vertices[-1]  # pad with last vertex
            norms[i, :nv] = m.vertex_normals
            norms[i, nv:] = m.vertex_normals[-1]
            if m.vertex_colors is not None:
                cols[i, :nv] = m.vertex_colors
                cols[i, nv:] = m.vertex_colors[-1]
            else:
                cols[i] = 0.5
            if any_tex and m.texture is not None and m.vertex_uvs is not None:
                uvs[i, :nv] = m.vertex_uvs
                uvs[i, nv:] = m.vertex_uvs[-1]
                texs[i] = _resize_texture(m.texture, TS)
                htex[i] = True
            faces[i, :nf] = m.faces
            fvalid[i, :nf] = True
            # Loss points: cyclic repetition of vertices (reference pads
            # with repeats too, pad_stack_tensors rigid_mesh_database.py:172).
            if nv >= P:
                idx = rng.choice(nv, P, replace=False)
            else:
                idx = np.arange(P) % nv
            points[i] = m.vertices[idx]
            sp, sv = sym_ops.pad_symmetries(self._sym_poses[label], S)
            syms[i] = sp.astype(np.float32)
            svalid[i] = sv
            diam[i] = m.diameter()

        return BatchedMeshes(
            vertices=jnp.asarray(verts),
            normals=jnp.asarray(norms),
            colors=jnp.asarray(cols),
            faces=jnp.asarray(faces),
            face_valid=jnp.asarray(fvalid),
            points=jnp.asarray(points),
            symmetries=jnp.asarray(syms),
            sym_valid=jnp.asarray(svalid),
            diameters=jnp.asarray(diam),
            labels=tuple(labels),
            uvs=None if uvs is None else jnp.asarray(uvs),
            textures=None if texs is None else jnp.asarray(texs),
            has_tex=None if htex is None else jnp.asarray(htex),
        )
