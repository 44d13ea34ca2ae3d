"""Native C++ mesh decimator (native/meshproc.cc) vs the numpy
reference implementation in meshes/io.py."""

import numpy as np
import pytest

from megapose6d_tpu import native
from megapose6d_tpu.meshes.io import (
    TriMesh,
    make_uv_sphere,
    simplify_vertex_clustering,
)

pytestmark = pytest.mark.skipif(
    not native.meshproc_available(), reason="no native toolchain"
)


def test_simplify_properties():
    mesh = make_uv_sphere(0.05, 48, 48)  # ~4.4k faces
    target = 500
    v, f, c = native.simplify_mesh(
        mesh.vertices, mesh.faces, mesh.vertex_colors, target
    )
    assert 0 < len(f) <= target
    assert f.min() >= 0 and f.max() < len(v)
    # No degenerate faces.
    assert (f[:, 0] != f[:, 1]).all()
    assert (f[:, 1] != f[:, 2]).all()
    assert (f[:, 0] != f[:, 2]).all()
    # Geometry is preserved: cluster means stay on/near the sphere.
    r = np.linalg.norm(v, axis=1)
    assert abs(float(np.median(r)) - 0.05) < 0.005
    # Colors aggregate per cluster.
    assert c is not None and c.shape == v.shape
    assert np.isfinite(c).all()


def test_simplify_passthrough_below_target():
    mesh = make_uv_sphere(0.05, 8, 8)
    v, f, c = native.simplify_mesh(
        mesh.vertices, mesh.faces, mesh.vertex_colors, 10_000
    )
    np.testing.assert_array_equal(v, mesh.vertices)
    np.testing.assert_array_equal(f, mesh.faces)


def test_io_uses_native_and_matches_numpy_quality():
    """simplify_vertex_clustering routes through the native path; its
    output quality (face count vs target, surface error) must match the
    numpy implementation's."""
    mesh = make_uv_sphere(0.05, 64, 64)
    target = 800
    out = simplify_vertex_clustering(mesh, target)  # native path
    assert 0 < out.n_faces <= target

    # Force the numpy path for comparison.
    import megapose6d_tpu.meshes.io as io_mod

    numpy_out = None
    orig = native.meshproc_available
    try:
        native.meshproc_available = lambda: False
        numpy_out = io_mod.simplify_vertex_clustering(mesh, target)
    finally:
        native.meshproc_available = orig
    assert 0 < numpy_out.n_faces <= target
    # Comparable coarseness: both searches should land within 2x of each
    # other's face count.
    assert out.n_faces > numpy_out.n_faces / 2
    r_nat = np.linalg.norm(out.vertices, axis=1)
    r_np = np.linalg.norm(numpy_out.vertices, axis=1)
    assert abs(np.median(r_nat) - np.median(r_np)) < 0.004
