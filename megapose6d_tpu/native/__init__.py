"""Native (C++) runtime components, bound via ctypes.

`decode.cc` is the input pipeline's image decoder (libpng/libjpeg + an
std::thread pool) — the TPU framework's equivalent of the native decode
work torch's C++ DataLoader workers do for the reference
(train_megapose.py:170-178). Built on first use with g++ (no pybind11 in
this environment; the C ABI + ctypes keeps the binding dependency-free)
and cached next to the source; falls back to PIL transparently when a
toolchain or the image libraries are unavailable.

`meshproc.cc` is the asset-preprocessing decimator (hash-grid vertex
clustering with the binary-search-on-cell-size semantics of
meshes/io.py:simplify_vertex_clustering) — the host-side analog of the
compiled mesh tooling (trimesh/open3d) the reference's asset pipeline
uses; at 20k-object DB builds the numpy fallback's unbuffered
np.add.at dominates.

Public API:
    available() -> bool
    decode_image(data: bytes) -> np.ndarray   # HxWxC u8, HxW u8, or HxW u16
    decode_batch(list[bytes], n_threads=0) -> list[np.ndarray]
    meshproc_available() -> bool
    simplify_mesh(verts, faces, colors, target_faces)
        -> (verts, faces, colors | None)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)

_SRC = Path(__file__).parent / "decode.cc"
_LIB_PATH = Path(__file__).parent / "_decode.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Path | None:
    """Compile decode.cc -> _decode.so if stale or missing."""
    if (
        _LIB_PATH.exists()
        and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime
    ):
        return _LIB_PATH
    # Compile to a per-pid temp file then atomically rename: dataloader
    # worker processes may race to build the same .so.
    tmp = _LIB_PATH.with_suffix(f".{os.getpid()}.tmp")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(tmp), "-lpng", "-ljpeg", "-lz",
        "-lpthread",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=120
        )
        os.replace(tmp, _LIB_PATH)
    except (OSError, subprocess.SubprocessError) as e:
        err = getattr(e, "stderr", "") or str(e)
        logger.info(f"native decoder unavailable (build failed): {err[:500]}")
        tmp.unlink(missing_ok=True)
        return None
    return _LIB_PATH


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError as e:
            logger.info(f"native decoder unavailable (load failed): {e}")
            return None
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.mp_image_info.argtypes = [u8p, ctypes.c_long, i32p, i32p, i32p, i32p]
        lib.mp_image_info.restype = ctypes.c_int
        lib.mp_decode_image.argtypes = [
            u8p, ctypes.c_long, u8p, ctypes.c_long, i32p, i32p, i32p, i32p,
        ]
        lib.mp_decode_image.restype = ctypes.c_int
        lib.mp_decode_batch.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_long),
            i32p, i32p, i32p, i32p,
            ctypes.c_int,
        ]
        lib.mp_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# meshproc (decimation)
# ---------------------------------------------------------------------------

_MESH_SRC = Path(__file__).parent / "meshproc.cc"
_MESH_LIB_PATH = Path(__file__).parent / "_meshproc.so"
_mesh_lib = None
_mesh_tried = False


def _load_meshproc():
    global _mesh_lib, _mesh_tried
    with _lock:
        if _mesh_tried:
            return _mesh_lib
        _mesh_tried = True
        if not (
            _MESH_LIB_PATH.exists()
            and _MESH_LIB_PATH.stat().st_mtime >= _MESH_SRC.stat().st_mtime
        ):
            tmp = _MESH_LIB_PATH.with_suffix(f".{os.getpid()}.tmp")
            cmd = [
                os.environ.get("CXX", "g++"),
                "-O2", "-shared", "-fPIC", "-std=c++17",
                str(_MESH_SRC), "-o", str(tmp),
            ]
            try:
                subprocess.run(
                    cmd, check=True, capture_output=True, text=True,
                    timeout=120,
                )
                os.replace(tmp, _MESH_LIB_PATH)
            except (OSError, subprocess.SubprocessError) as e:
                err = getattr(e, "stderr", "") or str(e)
                logger.info(f"native meshproc unavailable: {err[:500]}")
                tmp.unlink(missing_ok=True)
                return None
        try:
            lib = ctypes.CDLL(str(_MESH_LIB_PATH))
        except OSError as e:
            logger.info(f"native meshproc unavailable (load failed): {e}")
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.mp_simplify_mesh.argtypes = [
            f32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
            ctypes.c_int, ctypes.c_int,
            f32p, i32p, f32p, i32p, i32p,
        ]
        lib.mp_simplify_mesh.restype = ctypes.c_int
        _mesh_lib = lib
        return _mesh_lib


def meshproc_available() -> bool:
    return _load_meshproc() is not None


def simplify_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None,
    target_faces: int,
    max_iters: int = 32,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Decimate to <= target_faces (C++ vertex clustering). Shapes:
    verts [V,3] f32, faces [F,3] i32, colors [V,3] f32 or None."""
    lib = _load_meshproc()
    if lib is None:
        raise RuntimeError("native meshproc not available")
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    c = (
        np.ascontiguousarray(colors, np.float32)
        if colors is not None else None
    )
    n_v, n_f = len(v), len(f)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    out_c = np.empty_like(c) if c is not None else None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    rc = lib.mp_simplify_mesh(
        v.ctypes.data_as(f32p), n_v, f.ctypes.data_as(i32p), n_f,
        c.ctypes.data_as(f32p) if c is not None else None,
        int(target_faces), int(max_iters),
        out_v.ctypes.data_as(f32p), out_f.ctypes.data_as(i32p),
        out_c.ctypes.data_as(f32p) if out_c is not None else None,
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        raise ValueError(f"mp_simplify_mesh failed: {rc}")
    return (
        out_v[: nv.value].copy(),
        out_f[: nf.value].copy(),
        out_c[: nv.value].copy() if out_c is not None else None,
    )


def supports(data: bytes) -> bool:
    """True when `data` is a format the C++ decoder handles (PNG/JPEG).

    BOP datasets also ship .tif grays (itodd) and other formats; callers
    sniff the magic bytes and route those through PIL instead of getting
    a ValueError from mp_image_info.
    """
    head = bytes(data[:4])
    return head.startswith(b"\x89PNG") or head.startswith(b"\xff\xd8\xff")


def _as_u8p(buf) -> ctypes.POINTER(ctypes.c_ubyte):
    return ctypes.cast(
        ctypes.c_char_p(bytes(buf)), ctypes.POINTER(ctypes.c_ubyte)
    )


def _wrap(out: np.ndarray, h: int, w: int, c: int, bd: int) -> np.ndarray:
    if bd == 16:
        arr = out[: h * w * 2].view(np.uint16).reshape(h, w)
    elif c == 1:
        arr = out[: h * w].reshape(h, w)
    else:
        arr = out[: h * w * c].reshape(h, w, c)
    return arr


def decode_image(data: bytes) -> np.ndarray:
    """Decode one PNG/JPEG. uint8 [H,W,(C)] or uint16 [H,W] (16-bit PNG)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not available")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    buf = np.frombuffer(data, np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    rc = lib.mp_image_info(src, len(data), h, w, c, bd)
    if rc != 0:
        raise ValueError(f"mp_image_info failed: {rc}")
    cap = h.value * w.value * max(c.value, 1) * (2 if bd.value == 16 else 1)
    out = np.empty(cap, np.uint8)
    rc = lib.mp_decode_image(
        src, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        cap, h, w, c, bd,
    )
    if rc != 0:
        raise ValueError(f"mp_decode_image failed: {rc}")
    return _wrap(out, h.value, w.value, c.value, bd.value)


def decode_batch(datas: list[bytes], n_threads: int = 0) -> list[np.ndarray]:
    """Decode a batch in parallel C++ threads (n_threads=0: hw count)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not available")
    n = len(datas)
    if n == 0:
        return []
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    srcs_np = [np.frombuffer(d, np.uint8) for d in datas]
    bufs = (u8p * n)(*[s.ctypes.data_as(u8p) for s in srcs_np])
    sizes = (ctypes.c_long * n)(*[len(d) for d in datas])
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cs = (ctypes.c_int * n)()
    bds = (ctypes.c_int * n)()
    # Probe headers to size the outputs.
    outs_np = []
    caps = (ctypes.c_long * n)()
    outs = (u8p * n)()
    for i, s in enumerate(srcs_np):
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        bd = ctypes.c_int()
        rc = lib.mp_image_info(
            s.ctypes.data_as(u8p), len(datas[i]), h, w, c, bd
        )
        if rc != 0:
            raise ValueError(f"mp_image_info[{i}] failed: {rc}")
        cap = h.value * w.value * max(c.value, 1) * (
            2 if bd.value == 16 else 1
        )
        arr = np.empty(cap, np.uint8)
        outs_np.append(arr)
        caps[i] = cap
        outs[i] = arr.ctypes.data_as(u8p)
    rc = lib.mp_decode_batch(
        n, bufs, sizes, outs, caps, hs, ws, cs, bds,
        n_threads if n_threads > 0 else os.cpu_count() or 1,
    )
    if rc != 0:
        raise ValueError(f"mp_decode_batch failed: {rc}")
    return [
        _wrap(outs_np[i], hs[i], ws[i], cs[i], bds[i]) for i in range(n)
    ]
