"""Mesh IO, preprocessing, and the padded on-device mesh database."""

from .io import (  # noqa: F401
    TriMesh,
    load_mesh,
    load_obj,
    load_ply,
    make_cube,
    make_uv_sphere,
    simplify_vertex_clustering,
)
from .mesh_db import (  # noqa: F401
    BatchedMeshes,
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
)
