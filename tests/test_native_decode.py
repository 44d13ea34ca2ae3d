"""Native C++ image decoder (megapose6d_tpu/native): round-trip vs PIL on
PNG (8-bit RGB/gray/RGBA, 16-bit depth) and JPEG, batch thread-pool path,
and the reader integration fallback contract."""

import io

import numpy as np
import pytest

from megapose6d_tpu import native


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _jpeg_bytes(arr, quality=95):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain/image libs"
)


@needs_native
def test_png_rgb_roundtrip(rng):
    arr = rng.randint(0, 256, (37, 53, 3), dtype=np.uint8)
    out = native.decode_image(_png_bytes(arr))
    np.testing.assert_array_equal(out, arr)


@needs_native
def test_png_gray_and_rgba(rng):
    g = rng.randint(0, 256, (21, 17), dtype=np.uint8)
    np.testing.assert_array_equal(native.decode_image(_png_bytes(g)), g)
    rgba = rng.randint(0, 256, (19, 23, 4), dtype=np.uint8)
    np.testing.assert_array_equal(native.decode_image(_png_bytes(rgba)), rgba)


@needs_native
def test_png16_depth_roundtrip(rng):
    """BOP depth maps are 16-bit grayscale PNGs (mm)."""
    depth = rng.randint(0, 65536, (33, 41), dtype=np.uint16)
    out = native.decode_image(_png_bytes(depth))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, depth)


@needs_native
def test_jpeg_close_to_pil(rng):
    from PIL import Image

    arr = rng.randint(0, 256, (48, 64, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr)
    ours = native.decode_image(data)
    pil = np.asarray(Image.open(io.BytesIO(data)))
    assert ours.shape == pil.shape
    # Different IDCT implementations may differ by a few counts.
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 4


@needs_native
def test_decode_batch_threads(rng):
    arrs = [
        rng.randint(0, 256, (16 + i, 20 + 2 * i, 3), dtype=np.uint8)
        for i in range(17)
    ]
    datas = [_png_bytes(a) for a in arrs]
    outs = native.decode_batch(datas, n_threads=4)
    for a, o in zip(arrs, outs):
        np.testing.assert_array_equal(o, a)


@needs_native
def test_garbage_rejected():
    with pytest.raises(ValueError):
        native.decode_image(b"not an image at all............")


@needs_native
def test_reader_integration(rng, tmp_path):
    """bop_scene_dataset._imread uses the native path when available."""
    from PIL import Image

    from megapose6d_tpu.data.bop_scene_dataset import _imread

    arr = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    np.testing.assert_array_equal(_imread(p), arr)


@needs_native
def test_throughput_vs_pil(rng):
    """The native batch path should not be slower than sequential PIL
    (sanity, not a benchmark: single-core CI boxes make big wins flaky)."""
    import time

    from PIL import Image

    arrs = [
        rng.randint(0, 256, (240, 320, 3), dtype=np.uint8) for _ in range(24)
    ]
    datas = [_png_bytes(a) for a in arrs]
    native.decode_batch(datas[:2])  # warm the .so

    # Best-of-3 per arm: a single sample is dominated by scheduler noise
    # when the box is loaded (the thread pool loses its cores mid-batch),
    # which made this assert flaky under a concurrent TPU run.
    def best_of(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return best

    t_native = best_of(lambda: native.decode_batch(datas))

    def pil_all():
        for d in datas:
            np.asarray(Image.open(io.BytesIO(d)))

    t_pil = best_of(pil_all)
    assert t_native < t_pil * 1.5, (t_native, t_pil)


def test_supports_sniffs_magic_bytes(rng):
    """PNG/JPEG are routed to the C++ decoder; anything else (e.g. BOP
    itodd .tif grays) must fall back to PIL instead of erroring."""
    arr = rng.randint(0, 255, (8, 8, 3)).astype(np.uint8)
    assert native.supports(_png_bytes(arr))
    assert native.supports(_jpeg_bytes(arr))

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr[..., 0]).save(buf, format="TIFF")
    tif = buf.getvalue()
    assert not native.supports(tif)
    assert not native.supports(b"")


def test_imread_tif_fallback(rng, tmp_path):
    """bop_scene_dataset._imread decodes .tif via PIL even when the native
    decoder is present (itodd gray images, reference bop_scene_dataset.py:90)."""
    from PIL import Image

    from megapose6d_tpu.data.bop_scene_dataset import _imread

    arr = rng.randint(0, 255, (12, 16)).astype(np.uint8)
    p = tmp_path / "gray.tif"
    Image.fromarray(arr).save(p, format="TIFF")
    np.testing.assert_array_equal(_imread(p), arr)
