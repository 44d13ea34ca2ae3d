"""Mesh loading / preprocessing (host-side numpy, runs once per object set).

Replaces the reference's trimesh-based loading (megapose6d:
src/megapose/lib3d/rigid_mesh_database.py:57-130) with a dependency-free
PLY/OBJ reader plus texture baking and vertex-clustering decimation, producing
fixed-layout arrays ready for the padded device mesh database.

Everything here is offline preprocessing; nothing is jitted.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class TriMesh:
    """A triangle mesh with per-vertex attributes (float32/int32)."""

    vertices: np.ndarray  # [V, 3] float32
    faces: np.ndarray  # [F, 3] int32
    vertex_normals: np.ndarray | None = None  # [V, 3]
    vertex_colors: np.ndarray | None = None  # [V, 3] in [0, 1]
    # Per-pixel texturing (reference capability: Panda3D textured render,
    # panda3d_scene_renderer.py:298-358). UVs are per-VERTEX in [0, 1]
    # image convention (u right, v down); OBJ meshes with per-corner vt
    # are re-indexed at load so this holds. `texture` is [TH, TW, 3]
    # uint8. Both None for untextured meshes (vertex colors then drive
    # the render).
    vertex_uvs: np.ndarray | None = None  # [V, 2] float32 in [0, 1]
    texture: np.ndarray | None = None  # [TH, TW, 3] uint8

    def __post_init__(self):
        self.vertices = np.ascontiguousarray(self.vertices, np.float32)
        self.faces = np.ascontiguousarray(self.faces, np.int32)

    @property
    def n_vertices(self) -> int:
        return len(self.vertices)

    @property
    def n_faces(self) -> int:
        return len(self.faces)

    def with_computed_normals(self) -> "TriMesh":
        if self.vertex_normals is not None:
            return self
        return dataclasses.replace(
            self, vertex_normals=compute_vertex_normals(self.vertices, self.faces)
        )

    def scaled(self, scale: float) -> "TriMesh":
        return dataclasses.replace(
            self, vertices=(self.vertices * np.float32(scale))
        )

    def diameter(self, n_sample: int = 1000, seed: int = 0) -> float:
        """Approximate mesh diameter (max pairwise vertex distance), via
        subsampling like the reference (rigid_mesh_database.py:34-44)."""
        v = self.vertices
        if len(v) > n_sample:
            idx = np.random.RandomState(seed).choice(
                len(v), n_sample, replace=False
            )
            v = v[idx]
        d2 = ((v[None] - v[:, None]) ** 2).sum(-1)
        return float(np.sqrt(d2.max()))


def compute_vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = np.zeros_like(vertices)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(norm, 1e-12)).astype(np.float32)


# ---------------------------------------------------------------------------
# PLY
# ---------------------------------------------------------------------------

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def load_ply(path: str | Path) -> TriMesh:
    """Parse ascii / binary-little-endian PLY (the BOP model format)."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header\n")
    assert header_end >= 0, f"bad PLY header: {path}"
    header = data[:header_end].decode("ascii", "replace").splitlines()
    body = data[header_end + len(b"end_header\n"):]

    fmt = None
    elements: list[tuple[str, int, list]] = []  # (name, count, props)
    texture_file = None
    for line in header:
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "comment" and len(tok) >= 3 and tok[1] == "TextureFile":
            # BOP convention: `comment TextureFile obj_000001.png`.
            texture_file = tok[2]
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property":
            if tok[1] == "list":
                elements[-1][2].append(("list", tok[2], tok[3], tok[4]))
            else:
                elements[-1][2].append(("scalar", tok[1], tok[2]))

    assert fmt in ("ascii", "binary_little_endian"), fmt
    verts = normals = colors = uvs = None
    faces = None

    if fmt == "ascii":
        rows = body.decode("ascii").split("\n")
        cursor = 0
        for name, count, props in elements:
            chunk = rows[cursor : cursor + count]
            cursor += count
            if name == "vertex":
                arr = np.array(
                    [r.split() for r in chunk], dtype=np.float64
                )
                cols = [p[2] for p in props]
                verts, normals, colors, uvs = _extract_vertex_cols(arr, cols)
            elif name == "face":
                faces = _parse_ascii_faces(chunk)
    else:
        offset = 0
        for name, count, props in elements:
            if all(p[0] == "scalar" for p in props):
                dt = np.dtype(
                    [(p[2], "<" + _PLY_DTYPES[p[1]]) for p in props]
                )
                arr = np.frombuffer(body, dt, count, offset)
                offset += dt.itemsize * count
                if name == "vertex":
                    cols = [p[2] for p in props]
                    flat = np.stack(
                        [arr[c].astype(np.float64) for c in cols], -1
                    )
                    verts, normals, colors, uvs = _extract_vertex_cols(
                        flat, cols
                    )
            else:
                # Face element with a list property (+ possibly extra
                # scalars, e.g. texture coords): parse row by row.
                out = []
                for _ in range(count):
                    for p in props:
                        if p[0] == "list":
                            cnt_dt = np.dtype("<" + _PLY_DTYPES[p[1]])
                            idx_dt = np.dtype("<" + _PLY_DTYPES[p[2]])
                            n = int(
                                np.frombuffer(body, cnt_dt, 1, offset)[0]
                            )
                            offset += cnt_dt.itemsize
                            vals = np.frombuffer(body, idx_dt, n, offset)
                            offset += idx_dt.itemsize * n
                            if p[3] in ("vertex_indices", "vertex_index"):
                                out.append(vals.astype(np.int64))
                        else:
                            dt = np.dtype("<" + _PLY_DTYPES[p[1]])
                            offset += dt.itemsize
                if name == "face":
                    faces = _triangulate(out)

    assert verts is not None and faces is not None, f"PLY missing data: {path}"
    texture = None
    if texture_file is not None and uvs is not None:
        tex_path = Path(path).parent / texture_file
        if tex_path.exists():
            from PIL import Image

            texture = np.asarray(Image.open(tex_path).convert("RGB"), np.uint8)
            # PLY texture_v uses GL convention (v up); flip to image rows.
            uvs = np.stack([uvs[:, 0], 1.0 - uvs[:, 1]], axis=-1)
    if texture is None:
        uvs = None
    return TriMesh(
        vertices=verts.astype(np.float32),
        faces=faces.astype(np.int32),
        vertex_normals=None if normals is None else normals.astype(np.float32),
        vertex_colors=None if colors is None else colors.astype(np.float32),
        vertex_uvs=None if uvs is None else uvs.astype(np.float32),
        texture=texture,
    )


def _extract_vertex_cols(arr, cols):
    def get(names):
        idx = [cols.index(n) for n in names if n in cols]
        return arr[:, idx] if len(idx) == len(names) else None

    verts = get(["x", "y", "z"])
    normals = get(["nx", "ny", "nz"])
    colors = get(["red", "green", "blue"])
    if colors is not None and colors.max() > 1.0:
        colors = colors / 255.0
    uvs = get(["texture_u", "texture_v"])
    if uvs is None:
        uvs = get(["s", "t"])
    return verts, normals, colors, uvs


def _parse_ascii_faces(rows: list[str]) -> np.ndarray:
    polys = []
    for r in rows:
        tok = r.split()
        if not tok:
            continue
        n = int(tok[0])
        polys.append(np.array(tok[1 : 1 + n], dtype=np.int64))
    return _triangulate(polys)


def _triangulate(polys: list[np.ndarray]) -> np.ndarray:
    tris = []
    for p in polys:
        for k in range(1, len(p) - 1):
            tris.append((p[0], p[k], p[k + 1]))
    return np.asarray(tris, np.int64)


# ---------------------------------------------------------------------------
# OBJ (+ texture baking to vertex colors)
# ---------------------------------------------------------------------------

def _wrap_unit(u: np.ndarray) -> np.ndarray:
    """Wrap texture coordinates into [0,1], preserving values already in
    range (u=1.0 stays 1.0 — `% 1.0` would send it to 0.0)."""
    u = np.asarray(u, np.float64)
    return np.where((u >= 0.0) & (u <= 1.0), u, u - np.floor(u))


def load_obj(path: str | Path, bake_texture: bool = True) -> TriMesh:
    """Parse Wavefront OBJ. Texture (first map_Kd of the .mtl) is baked to
    per-vertex colors — our rasterizer interpolates vertex attributes, which
    at the reference's 240x320 render resolution is a good approximation of
    full texture sampling for typical BOP/GSO assets."""
    path = Path(path)
    vs: list = []
    vts: list = []
    faces_v: list = []
    faces_vt: list = []
    mtl_file = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                vs.append([float(x) for x in tok[1:4]])
            elif tok[0] == "vt":
                vts.append([float(tok[1]), float(tok[2])])
            elif tok[0] == "mtllib":
                mtl_file = tok[1]
            elif tok[0] == "f":
                idxs = []
                tidxs = []
                for vert in tok[1:]:
                    parts = vert.split("/")
                    idxs.append(int(parts[0]))
                    if len(parts) > 1 and parts[1]:
                        tidxs.append(int(parts[1]))
                for k in range(1, len(idxs) - 1):
                    faces_v.append((idxs[0], idxs[k], idxs[k + 1]))
                    if len(tidxs) == len(idxs):
                        faces_vt.append((tidxs[0], tidxs[k], tidxs[k + 1]))

    verts = np.asarray(vs, np.float64)
    nv = len(verts)
    faces = np.asarray(faces_v, np.int64)
    faces = np.where(faces > 0, faces - 1, faces + nv)

    tex = None
    fvt = None
    if mtl_file and vts and len(faces_vt) == len(faces_v):
        tex = _load_mtl_texture(path.parent / mtl_file)
        if tex is not None:
            uvs_raw = np.asarray(vts, np.float64)
            fvt = np.asarray(faces_vt, np.int64)
            fvt = np.where(fvt > 0, fvt - 1, fvt + len(uvs_raw))

    colors = None
    vertex_uvs = None
    texture_u8 = None
    if tex is not None:
        if bake_texture:
            colors = _bake_vertex_colors(nv, faces, fvt, uvs_raw, tex)
        else:
            # Keep per-pixel texturing: OBJ uvs are per face corner, so
            # split vertices on unique (v_idx, vt_idx) pairs to make them
            # per-vertex (standard GL-style re-indexing).
            pairs = np.stack([faces.reshape(-1), fvt.reshape(-1)], axis=1)
            uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
            verts = verts[uniq[:, 0]]
            uv = uvs_raw[uniq[:, 1]]
            # OBJ v is GL convention (v up); flip to image rows. Wrap only
            # coordinates strictly outside [0,1]: `% 1.0` would map u=1.0
            # to 0.0 and GL v=0 to image-v 0.0, collapsing full-range UVs
            # to a single texel under the clamping bilinear sampler.
            u = _wrap_unit(uv[:, 0])
            v = _wrap_unit(uv[:, 1])
            vertex_uvs = np.stack([u, 1.0 - v], axis=-1).astype(np.float32)
            faces = inv.reshape(-1, 3)
            texture_u8 = (np.clip(tex, 0, 1) * 255).astype(np.uint8)

    return TriMesh(
        vertices=verts.astype(np.float32),
        faces=faces.astype(np.int32),
        vertex_colors=colors,
        vertex_uvs=vertex_uvs,
        texture=texture_u8,
    )


def _load_mtl_texture(mtl_path: Path) -> np.ndarray | None:
    if not mtl_path.exists():
        return None
    tex_file = None
    for line in open(mtl_path, "r", errors="replace"):
        tok = line.split()
        if tok and tok[0].lower() == "map_kd":
            tex_file = tok[-1]
            break
    if tex_file is None:
        return None
    tex_path = mtl_path.parent / tex_file
    if not tex_path.exists():
        return None
    from PIL import Image

    img = np.asarray(Image.open(tex_path).convert("RGB"), np.float32) / 255.0
    return img


def _bake_vertex_colors(nv, faces, faces_vt, uvs, tex) -> np.ndarray:
    """Average the texture color of each vertex's texcoords over incident
    face corners."""
    H, W, _ = tex.shape
    colors = np.zeros((nv, 3), np.float64)
    counts = np.zeros((nv, 1), np.float64)
    uv = uvs[faces_vt.reshape(-1)]  # [F*3, 2]
    u = np.clip((uv[:, 0] % 1.0) * (W - 1), 0, W - 1).astype(np.int64)
    v = np.clip(((1.0 - uv[:, 1]) % 1.0) * (H - 1), 0, H - 1).astype(np.int64)
    texel = tex[v, u]
    vidx = faces.reshape(-1)
    np.add.at(colors, vidx, texel)
    np.add.at(counts, vidx, 1.0)
    return (colors / np.maximum(counts, 1.0)).astype(np.float32)


def bake_texture_to_colors(mesh: TriMesh) -> TriMesh:
    """Sample the texture at each vertex UV -> vertex colors; drops the
    texture. Used for low-LOD copies and texture-free render paths."""
    if mesh.texture is None or mesh.vertex_uvs is None:
        return mesh
    H, W, _ = mesh.texture.shape
    u = np.clip(mesh.vertex_uvs[:, 0] * (W - 1), 0, W - 1).astype(np.int64)
    v = np.clip(mesh.vertex_uvs[:, 1] * (H - 1), 0, H - 1).astype(np.int64)
    colors = mesh.texture[v, u].astype(np.float32) / 255.0
    return dataclasses.replace(
        mesh, vertex_colors=colors, vertex_uvs=None, texture=None
    )


def load_mesh(path: str | Path, **kw) -> TriMesh:
    path = Path(path)
    if path.suffix.lower() == ".ply":
        return load_ply(path)
    if path.suffix.lower() == ".obj":
        return load_obj(path, **kw)
    raise ValueError(f"unsupported mesh format: {path}")


# ---------------------------------------------------------------------------
# Decimation (vertex clustering)
# ---------------------------------------------------------------------------

def simplify_vertex_clustering(mesh: TriMesh, target_faces: int) -> TriMesh:
    """Reduce face count below `target_faces` via uniform-grid vertex
    clustering (binary search on cell size). Silhouette-accurate enough for
    240x320 render-and-compare; replaces nothing in the reference (Panda3D
    rasterized full meshes) but bounds our static face budget.

    Uses the native C++ path (native/meshproc.cc — the whole 32-iteration
    binary search in one call) when the toolchain builds it; numpy
    otherwise."""
    if mesh.n_faces <= target_faces:
        return mesh
    try:
        from .. import native

        if native.meshproc_available():
            v, f, c = native.simplify_mesh(
                mesh.vertices, mesh.faces, mesh.vertex_colors, target_faces
            )
            return TriMesh(
                vertices=v, faces=f, vertex_colors=c
            ).with_computed_normals()
    except (RuntimeError, ValueError, OSError):
        pass  # fall through to the numpy path
    lo, hi = 1e-5, 1.0
    ext = float(
        np.linalg.norm(mesh.vertices.max(0) - mesh.vertices.min(0))
    )
    best = None
    for _ in range(32):
        cell = (lo + hi) / 2
        m = _cluster_once(mesh, cell * ext)
        if m.n_faces > target_faces:
            lo = cell
        else:
            best = m
            hi = cell
    return best if best is not None else _cluster_once(mesh, hi * ext)


def _cluster_once(mesh: TriMesh, cell: float) -> TriMesh:
    v = mesh.vertices
    keys = np.floor((v - v.min(0)) / max(cell, 1e-12)).astype(np.int64)
    flat = keys[:, 0] * 73856093 ^ keys[:, 1] * 19349663 ^ keys[:, 2] * 83492791
    uniq, inv = np.unique(flat, return_inverse=True)
    n_new = len(uniq)
    pos = np.zeros((n_new, 3), np.float64)
    cnt = np.zeros((n_new, 1), np.float64)
    np.add.at(pos, inv, v)
    np.add.at(cnt, inv, 1.0)
    pos = (pos / cnt).astype(np.float32)

    new_faces = inv[mesh.faces]
    keep = (
        (new_faces[:, 0] != new_faces[:, 1])
        & (new_faces[:, 1] != new_faces[:, 2])
        & (new_faces[:, 0] != new_faces[:, 2])
    )
    new_faces = new_faces[keep].astype(np.int32)

    colors = None
    if mesh.vertex_colors is not None:
        c = np.zeros((n_new, 3), np.float64)
        np.add.at(c, inv, mesh.vertex_colors)
        colors = (c / cnt).astype(np.float32)
    out = TriMesh(vertices=pos, faces=new_faces, vertex_colors=colors)
    return out.with_computed_normals()


# ---------------------------------------------------------------------------
# Procedural meshes (tests & visual debugging; analog of the reference's
# panda3d_renderer/geometry.py debug primitives)
# ---------------------------------------------------------------------------

def make_random_texture(
    size: int = 128, cells: int = 16, seed: int = 0
) -> np.ndarray:
    """High-frequency random block texture `[size, size, 3] uint8`.

    Rotation-and-compare needs visually rich surfaces: smooth vertex-color
    gradients change only ~0.001 rgb/pixel/degree, which drowns in the
    renderer/crop resampling noise floor; block textures give sharp,
    orientation-revealing features (real BOP/GSO assets are textured —
    the reference always renders textures, panda3d_scene_renderer.py:298)."""
    rng = np.random.RandomState(seed)
    blocks = rng.uniform(0.1, 1.0, size=(cells, cells, 3))
    up = size // cells
    img = np.kron(blocks, np.ones((up, up, 1)))
    return (img * 255).astype(np.uint8)


def make_cube(
    half_extent: float = 0.05,
    color=(0.8, 0.2, 0.2),
    textured: bool = False,
    seed: int = 0,
) -> TriMesh:
    """Flat-shaded cube: 24 vertices (4 per face) so vertex normals are the
    true face normals, not corner averages.

    With ``textured=True``, each face maps to a distinct tile of a 3x2
    random-block atlas (all six faces visually distinct, breaking the
    cube's rotational symmetry in appearance)."""
    h = half_extent
    # (normal axis, sign) for the 6 faces.
    verts = []
    normals = []
    faces = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            n = np.zeros(3)
            n[axis] = sign
            u = np.zeros(3)
            u[(axis + 1) % 3] = 1.0
            v = np.cross(n, u)
            base = len(verts)
            for su, sv in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                verts.append(n * h + u * su * h + v * sv * h)
                normals.append(n)
            faces.append([base, base + 1, base + 2])
            faces.append([base, base + 2, base + 3])
    verts = np.asarray(verts, np.float32)
    normals = np.asarray(normals, np.float32)
    colors = np.tile(np.asarray(color, np.float32), (len(verts), 1))
    uvs = texture = None
    if textured:
        # Face f -> atlas tile (f % 3, f // 3) of a 3x2 grid; inset by half
        # a texel so bilinear lookups don't bleed across tiles.
        uvs = np.zeros((24, 2), np.float32)
        pad = 1.0 / 128.0
        for f in range(6):
            fx, fy = f % 3, f // 3
            u0, u1 = fx / 3 + pad, (fx + 1) / 3 - pad
            v0, v1 = fy / 2 + pad, (fy + 1) / 2 - pad
            uvs[4 * f : 4 * f + 4] = [
                [u0, v0], [u1, v0], [u1, v1], [u0, v1]
            ]
        texture = make_random_texture(size=192, cells=24, seed=seed)
    return TriMesh(
        verts,
        np.asarray(faces, np.int32),
        vertex_normals=normals,
        vertex_colors=colors,
        vertex_uvs=uvs,
        texture=texture,
    )


def make_uv_sphere(
    radius: float = 0.05,
    n_lat: int = 16,
    n_lon: int = 24,
    color=(0.2, 0.4, 0.8),
    textured: bool = False,
    seed: int = 1,
) -> TriMesh:
    """UV sphere. With ``textured=True`` the longitude seam column is
    duplicated so spherical UVs (u=lon/2pi, v=lat/pi) interpolate cleanly,
    and a random-block texture is attached (see make_random_texture)."""
    # Textured variant duplicates the u=1 seam column: n_lon+1 columns.
    n_col = n_lon + 1 if textured else n_lon
    lats = np.linspace(0, np.pi, n_lat + 1)
    lons = np.linspace(0, 2 * np.pi, n_col, endpoint=not textured)
    verts = []
    uvs = [] if textured else None
    for th in lats:
        for k, ph in enumerate(lons):
            verts.append(
                [
                    radius * np.sin(th) * np.cos(ph),
                    radius * np.sin(th) * np.sin(ph),
                    radius * np.cos(th),
                ]
            )
            if textured:
                uvs.append([k / n_lon, th / np.pi])
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            jn = j + 1 if textured else (j + 1) % n_lon
            a = i * n_col + j
            b = i * n_col + jn
            c = (i + 1) * n_col + j
            d = (i + 1) * n_col + jn
            if i > 0:  # ring-0 vertices are all the pole: [a,c,b] degenerate
                faces.append([a, c, b])
            if i < n_lat - 1:  # last ring collapses to the south pole
                faces.append([b, c, d])
    colors = np.tile(np.asarray(color, np.float32), (len(verts), 1))
    texture = make_random_texture(size=192, cells=24, seed=seed) if textured else None
    return TriMesh(
        verts,
        np.asarray(faces, np.int32),
        vertex_colors=colors,
        vertex_uvs=None if uvs is None else np.asarray(uvs, np.float32),
        texture=texture,
    ).with_computed_normals()


def make_cylinder(
    radius: float = 0.02,
    length: float = 0.1,
    n_seg: int = 24,
    color=(0.4, 0.7, 0.3),
    textured: bool = False,
    seed: int = 2,
) -> TriMesh:
    """Closed cylinder along +z (panda3d_renderer/geometry.py analog).

    With ``textured=True`` the side wraps u=angle over the atlas'
    lower band (seam column duplicated so interpolation never crosses
    the u=1->0 jump, like make_uv_sphere) and each cap maps to its own
    disc in the upper band — every surface point gets a distinct tile
    of the random-block texture (see make_random_texture)."""
    if textured:
        return _textured_cylinder(radius, length, n_seg, seed)
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    ring = np.stack([np.cos(ang) * radius, np.sin(ang) * radius], -1)
    bot = np.concatenate([ring, np.full((n_seg, 1), -length / 2)], -1)
    top = np.concatenate([ring, np.full((n_seg, 1), length / 2)], -1)
    centers = np.asarray([[0, 0, -length / 2], [0, 0, length / 2]])
    verts = np.concatenate([bot, top, centers]).astype(np.float32)
    faces = []
    cb, ct = 2 * n_seg, 2 * n_seg + 1
    for i in range(n_seg):
        j = (i + 1) % n_seg
        faces += [[i, j, n_seg + i], [j, n_seg + j, n_seg + i]]  # side
        faces += [[cb, j, i], [ct, n_seg + i, n_seg + j]]  # caps
    colors = np.tile(np.asarray(color, np.float32), (len(verts), 1))
    return TriMesh(
        verts, np.asarray(faces, np.int32), vertex_colors=colors
    ).with_computed_normals()


def _textured_cylinder(
    radius: float, length: float, n_seg: int, seed: int
) -> TriMesh:
    """Textured cylinder body for make_cylinder(textured=True): side and
    caps carry explicit (duplicated) vertices so UVs are seam-safe."""
    ang = np.linspace(0, 2 * np.pi, n_seg + 1)  # duplicated seam column
    cx, sy = np.cos(ang) * radius, np.sin(ang) * radius
    pad = 1.0 / 128.0
    verts, uvs, faces = [], [], []
    # Side: 2 rows x (n_seg+1) cols; v-band [pad, 0.66].
    for row, z in enumerate((-length / 2, length / 2)):
        for j in range(n_seg + 1):
            verts.append([cx[j], sy[j], z])
            uvs.append([pad + (1 - 2 * pad) * j / n_seg,
                        pad + (0.66 - 2 * pad) * row])
    for j in range(n_seg):
        a, b = j, j + 1
        c, d = (n_seg + 1) + j, (n_seg + 1) + j + 1
        faces += [[a, b, c], [b, d, c]]
    # Caps: own rim vertices (polar UV discs in the upper band).
    for s, (z, cu) in enumerate(
        ((-length / 2, 0.25), (length / 2, 0.75))
    ):
        base = len(verts)
        for j in range(n_seg):
            verts.append([cx[j], sy[j], z])
            uvs.append([cu + 0.11 * np.cos(ang[j]),
                        0.84 + 0.11 * np.sin(ang[j])])
        verts.append([0.0, 0.0, z])
        uvs.append([cu, 0.84])
        center = base + n_seg
        for j in range(n_seg):
            jn = (j + 1) % n_seg
            if s == 0:  # bottom cap faces -z: wind [c, j, i]
                faces.append([center, base + jn, base + j])
            else:  # top cap faces +z: wind [c, i, j]
                faces.append([center, base + j, base + jn])
    return TriMesh(
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
        vertex_colors=np.full((len(verts), 3), 0.7, np.float32),
        vertex_uvs=np.asarray(uvs, np.float32),
        texture=make_random_texture(size=192, cells=24, seed=seed),
    ).with_computed_normals()


def make_cone(
    radius: float = 0.02,
    height: float = 0.06,
    n_seg: int = 24,
    color=(0.8, 0.6, 0.2),
    textured: bool = False,
    seed: int = 3,
) -> TriMesh:
    """Closed cone, apex at +z (geometry.py analog).

    With ``textured=True`` the slanted side maps u=angle / v=height over
    the atlas' lower band (seam column AND apex duplicated per column,
    the make_uv_sphere pole treatment) and the base cap gets a polar
    disc in the upper band."""
    if textured:
        return _textured_cone(radius, height, n_seg, seed)
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    base = np.stack(
        [np.cos(ang) * radius, np.sin(ang) * radius, np.zeros(n_seg)], -1
    )
    verts = np.concatenate(
        [base, [[0, 0, height], [0, 0, 0]]]
    ).astype(np.float32)
    apex, center = n_seg, n_seg + 1
    faces = []
    for i in range(n_seg):
        j = (i + 1) % n_seg
        faces += [[i, j, apex], [center, j, i]]
    colors = np.tile(np.asarray(color, np.float32), (len(verts), 1))
    return TriMesh(
        verts, np.asarray(faces, np.int32), vertex_colors=colors
    ).with_computed_normals()


def _textured_cone(
    radius: float, height: float, n_seg: int, seed: int
) -> TriMesh:
    """Textured cone body for make_cone(textured=True)."""
    ang = np.linspace(0, 2 * np.pi, n_seg + 1)  # duplicated seam column
    cx, sy = np.cos(ang) * radius, np.sin(ang) * radius
    pad = 1.0 / 128.0
    verts, uvs, faces = [], [], []
    # Base ring row (v at the bottom of the side band) then a
    # per-column apex row (the sphere's pole-ring trick: each column
    # keeps its own u so texture interpolation stays local).
    for j in range(n_seg + 1):
        verts.append([cx[j], sy[j], 0.0])
        uvs.append([pad + (1 - 2 * pad) * j / n_seg, 0.66 - pad])
    for j in range(n_seg + 1):
        verts.append([0.0, 0.0, height])
        uvs.append([pad + (1 - 2 * pad) * j / n_seg, pad])
    for j in range(n_seg):
        # Side winding matches the untextured [i, j, apex].
        faces.append([j, j + 1, (n_seg + 1) + j])
    # Base cap: own rim with a polar UV disc in the upper band.
    cap = len(verts)
    for j in range(n_seg):
        verts.append([cx[j], sy[j], 0.0])
        uvs.append([0.5 + 0.11 * np.cos(ang[j]),
                    0.84 + 0.11 * np.sin(ang[j])])
    verts.append([0.0, 0.0, 0.0])
    uvs.append([0.5, 0.84])
    center = cap + n_seg
    for j in range(n_seg):
        jn = (j + 1) % n_seg
        faces.append([center, cap + jn, cap + j])  # faces -z: [c, j, i]
    return TriMesh(
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
        vertex_colors=np.full((len(verts), 3), 0.7, np.float32),
        vertex_uvs=np.asarray(uvs, np.float32),
        texture=make_random_texture(size=192, cells=24, seed=seed),
    ).with_computed_normals()


def make_axes(length: float = 0.1, radius_ratio: float = 0.03) -> TriMesh:
    """RGB xyz axes gizmo as one mesh (geometry.py:make_axes:59 analog)."""
    r = length * radius_ratio
    parts = []
    for axis, color in (
        (0, (0.9, 0.1, 0.1)), (1, (0.1, 0.9, 0.1)), (2, (0.1, 0.1, 0.9))
    ):
        cyl = make_cylinder(r, length, 12, color)
        v = cyl.vertices.copy()
        v[:, 2] += length / 2  # base at origin
        if axis == 0:
            v = v[:, [2, 1, 0]] * np.asarray([1, 1, -1], np.float32)
        elif axis == 1:
            v = v[:, [0, 2, 1]] * np.asarray([1, 1, -1], np.float32)
        parts.append((v, cyl.faces, cyl.vertex_colors))
    offset = 0
    verts, faces, colors = [], [], []
    for v, f, c in parts:
        verts.append(v)
        faces.append(f + offset)
        colors.append(c)
        offset += len(v)
    return TriMesh(
        np.concatenate(verts),
        np.concatenate(faces).astype(np.int32),
        vertex_colors=np.concatenate(colors),
    ).with_computed_normals()


def save_ply(mesh: TriMesh, path: str | Path) -> Path:
    """ASCII PLY writer (BOP models are PLY; bop_datasets_format.md).

    Writes positions, normals (computed if absent), uint8 vertex colors
    when present, and — for per-pixel-textured meshes — `texture_u` /
    `texture_v` properties plus a `comment TextureFile <name>.png` line
    with the texture image saved alongside, the convention BOP's own
    textured models (e.g. YCB-V) use and `load_ply` reads back.
    """
    mesh = mesh.with_computed_normals()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    has_color = mesh.vertex_colors is not None
    has_tex = mesh.vertex_uvs is not None and mesh.texture is not None
    lines = ["ply", "format ascii 1.0"]
    if has_tex:
        tex_name = path.stem + ".png"
        from PIL import Image

        Image.fromarray(mesh.texture).save(path.parent / tex_name)
        lines.append(f"comment TextureFile {tex_name}")
    lines += [
        f"element vertex {mesh.n_vertices}",
        "property float x",
        "property float y",
        "property float z",
        "property float nx",
        "property float ny",
        "property float nz",
    ]
    if has_color:
        lines += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    if has_tex:
        lines += ["property float texture_u", "property float texture_v"]
    lines += [
        f"element face {mesh.n_faces}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    n = mesh.vertex_normals
    if has_color:
        c8 = np.clip(mesh.vertex_colors * 255.0, 0, 255).astype(np.uint8)
    if has_tex:
        # TriMesh UVs are image-convention (v down); PLY texture_v is
        # GL-convention (v up) — the inverse of the load_ply flip.
        uv_gl = np.stack(
            [mesh.vertex_uvs[:, 0], 1.0 - mesh.vertex_uvs[:, 1]], axis=-1
        )
    rows = []
    for i, v in enumerate(mesh.vertices):
        row = f"{v[0]} {v[1]} {v[2]} {n[i][0]} {n[i][1]} {n[i][2]}"
        if has_color:
            row += f" {c8[i][0]} {c8[i][1]} {c8[i][2]}"
        if has_tex:
            row += f" {uv_gl[i][0]} {uv_gl[i][1]}"
        rows.append(row)
    for f in mesh.faces:
        rows.append(f"3 {f[0]} {f[1]} {f[2]}")
    path.write_text("\n".join(lines + rows) + "\n")
    return path
