"""Native (C/libjpeg) decode pipeline: bit-exact parity vs the PIL path.

The native library must be BIT-IDENTICAL to pipeline.decode_image on
JPEGs — the pixel-exact clean-view golden chain (test_augment.py) and the
decoded-episode cache key both assume the decode output is
backend-independent.  Non-JPEG / unsupported inputs must fall back to PIL
per item.
"""

import io
import os
import zlib

import numpy as np
import pytest

from mft_tpu.data import native_decode as nd
from mft_tpu.data.pipeline import decode_image

pytestmark = pytest.mark.skipif(
    nd._load() is None, reason="native decode library unavailable (no toolchain/libjpeg)"
)


def _jpeg_bytes(rs, w, h, mode="RGB", quality=88, progressive=False):
    from PIL import Image

    src = rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).convert(mode).save(buf, "JPEG", quality=quality, progressive=progressive)
    return buf.getvalue()


@pytest.mark.parametrize(
    "w,h,mode,progressive",
    [
        (600, 400, "RGB", False),   # draft scale 1 at base 257
        (2100, 1500, "RGB", False), # draft scale 4
        (2100, 1500, "RGB", True),  # progressive + draft
        (257, 257, "RGB", False),   # identity resize short-circuit
        (100, 80, "RGB", False),    # upscale
        (520, 519, "RGB", False),   # off-by-one draft boundary
        (300, 200, "L", False),     # grayscale -> RGB replication
    ],
)
def test_decode_bit_exact_vs_pil(tmp_path, w, h, mode, progressive):
    # PYTHONHASHSEED-independent seed: the bit-exactness comparison must run
    # on the SAME source images every process, or a content-dependent
    # divergence becomes unreproducible
    rs = np.random.RandomState(zlib.crc32(f"{w}x{h}:{mode}:{progressive}".encode()) % 2**31)
    data = _jpeg_bytes(rs, w, h, mode=mode, progressive=progressive)
    p = tmp_path / "img.jpg"
    p.write_bytes(data)
    for base in (257, 64):
        native = nd.decode_jpeg_bytes(data, base, draft=True)
        assert native is not None
        ref = decode_image(str(p), base)
        assert np.array_equal(native, ref), (
            f"native decode diverged from PIL at base={base} "
            f"(maxdiff={np.abs(native.astype(int) - ref.astype(int)).max()})"
        )


def test_decode_no_draft_matches_pil(tmp_path, monkeypatch):
    rs = np.random.RandomState(3)
    data = _jpeg_bytes(rs, 1200, 900)
    p = tmp_path / "img.jpg"
    p.write_bytes(data)
    monkeypatch.setenv("MFT_DRAFT_DECODE", "0")
    native = nd.decode_jpeg_bytes(data, 128, draft=False)
    assert np.array_equal(native, decode_image(str(p), 128))


def test_resample_bit_exact_vs_pil():
    from PIL import Image

    rs = np.random.RandomState(7)
    for (w, h, ow, oh) in [(300, 200, 257, 257), (100, 80, 257, 257), (331, 77, 64, 64)]:
        arr = rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
        native = nd.resample_rgb(arr, ow, oh)
        ref = np.asarray(Image.fromarray(arr).resize((ow, oh), Image.BILINEAR))
        assert np.array_equal(native, ref)


def test_batch_statuses_and_fallback(tmp_path):
    rs = np.random.RandomState(1)
    jp = tmp_path / "a.jpg"
    jp.write_bytes(_jpeg_bytes(rs, 320, 240))
    png = tmp_path / "b.png"
    from PIL import Image

    Image.fromarray(rs.randint(0, 256, (60, 80, 3), dtype=np.uint8)).save(png, "PNG")
    missing = tmp_path / "missing.jpg"

    out, status = nd.decode_batch([str(jp), str(png), str(missing)], 64, threads=2)
    assert status[0] == nd.OK
    assert status[1] == nd.ERR_NOT_JPEG
    assert status[2] == nd.ERR_IO
    assert np.array_equal(out[0], decode_image(str(jp), 64))


def test_decode_many_mixed_items_matches_decode_image(tmp_path, monkeypatch):
    """decode_many over paths (JPEG + PNG), an in-memory array, and a missing
    file's PIL error propagation — order-preserving, backend-independent."""
    import concurrent.futures as cf

    rs = np.random.RandomState(2)
    jp = tmp_path / "a.jpg"
    jp.write_bytes(_jpeg_bytes(rs, 500, 300))
    png = tmp_path / "b.png"
    from PIL import Image

    Image.fromarray(rs.randint(0, 256, (60, 80, 3), dtype=np.uint8)).save(png, "PNG")
    arr = rs.rand(40, 40, 3).astype(np.float32)
    items = [str(jp), str(png), arr, str(jp)]

    with cf.ThreadPoolExecutor(2) as pool:
        for mode in ("auto", "0"):
            monkeypatch.setenv("MFT_NATIVE_DECODE", mode)
            got = nd.decode_many(items, 64, pool=pool, workers=2, fallback=decode_image)
            want = [decode_image(it, 64) for it in items]
            for g, w in zip(got, want):
                assert np.array_equal(g, w)


def test_truncated_jpeg_demoted_to_pil_fallback(tmp_path):
    """A truncated stream decodes to backend-DEFINED pixels in the missing
    region, so the native path must refuse it (MFT_ERR_TRUNCATED via the
    num_warnings check) rather than write backend-dependent bytes into the
    backend-agnostic episode cache; decode_many then recovers that file via
    PIL's LOAD_TRUNCATED_IMAGES path, identically on both backends."""
    import concurrent.futures as cf

    rs = np.random.RandomState(4)
    data = _jpeg_bytes(rs, 800, 600)
    cut = data[: len(data) // 2]
    p = tmp_path / "trunc.jpg"
    p.write_bytes(cut)
    # native refuses: any libjpeg warning (fake EOI) demotes the result
    assert nd.decode_jpeg_bytes(cut, 64, draft=True) is None
    _, status = nd.decode_batch([str(p)], 64, threads=1)
    assert status[0] == nd.ERR_TRUNCATED
    # ...and the composed path still survives, bit-identically to PIL
    ref = decode_image(str(p), 64)
    assert ref.shape == (64, 64, 3)
    with cf.ThreadPoolExecutor(1) as pool:
        got = nd.decode_many([str(p)], 64, pool=pool, workers=1, fallback=decode_image)
    assert np.array_equal(got[0], ref)


def test_corrupt_entropy_data_fails_cleanly():
    """Valid JPEG header + garbage entropy data must return a DECODE error
    through the longjmp error path (not crash the worker), and decode_many
    must recover via the PIL fallback's LOAD_TRUNCATED semantics."""
    rs = np.random.RandomState(6)
    data = _jpeg_bytes(rs, 200, 150)
    corrupt = data[:200] + bytes(rs.randint(0, 256, 400, dtype=np.uint8).tolist())
    for _ in range(8):  # repeated: the r4-fixed setjmp/volatile path must be stable
        out = nd.decode_jpeg_bytes(corrupt, 64, draft=True)
        assert out is None or out.shape == (64, 64, 3)  # error or tolerated-truncation


def test_backend_canary_and_env(monkeypatch):
    monkeypatch.setenv("MFT_NATIVE_DECODE", "0")
    assert nd.backend() == "pil"
    monkeypatch.setenv("MFT_NATIVE_DECODE", "auto")
    assert nd.backend() in ("native", "pil")  # canary-gated
    if nd._load() is not None:
        monkeypatch.setenv("MFT_NATIVE_DECODE", "1")
        assert nd.backend() == "native"


def test_episode_stream_native_matches_pil(tmp_path, monkeypatch):
    """EpisodeStream end to end: identical episodes from both backends."""
    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.data.manifests import Manifest
    from mft_tpu.data.pipeline import EpisodeStream

    rs = np.random.RandomState(5)
    items, labels = [], []
    for c in range(3):
        for i in range(4):
            p = tmp_path / f"c{c}_{i}.jpg"
            p.write_bytes(_jpeg_bytes(rs, 120 + 10 * i, 90, quality=80 + c))
            items.append(str(p))
            labels.append(c)
    man = Manifest(items=items, labels=np.asarray(labels), n_classes=3)
    spec = EpisodeSpec(n_way=2, n_support=1, n_query=1)

    def run():
        stream = EpisodeStream(man, spec, 2, base_size=48, seed=3, workers=2)
        return [(np.asarray(im), np.asarray(cl)) for im, cl in stream]

    monkeypatch.setenv("MFT_NATIVE_DECODE", "1")
    native = run()
    monkeypatch.setenv("MFT_NATIVE_DECODE", "0")
    pil = run()
    for (ia, ca), (ib, cb) in zip(native, pil):
        assert np.array_equal(ia, ib) and np.array_equal(ca, cb)
