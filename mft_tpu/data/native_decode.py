"""ctypes binding for the native (C/libjpeg) decode pipeline.

The reference's input runtime is native too — torch's DataLoader worker
machinery plus PIL's C decode path (/root/reference/data/datamgr.py:50-62,
datasets/CropDisease_few_shot.py:112-124).  ``_native/decode.c`` is the
TPU-framework equivalent: libjpeg draft-scaled decode + a bit-exact
reimplementation of PIL's fixed-point antialiased BILINEAR resample, with
an in-library pthread pool so batch decode scales with host cores without
touching the GIL.

Backend selection (``MFT_NATIVE_DECODE``):

* ``auto`` (default): use the native library iff it loads (building it
  from source on first use when a toolchain is available) AND a canary
  check proves its output BIT-IDENTICAL to the PIL path on representative
  JPEGs (all draft scales 8/4/2/1, grayscale, progressive, 4:4:4 and
  4:2:0 subsampling).  Anything less falls back to PIL
  silently — the pixel-exact clean-view golden chain
  (tests/test_augment.py) must hold regardless of backend, which is also
  why the decoded-episode cache key does not include the backend.
* ``1``: require native (raises if the library can't be built/loaded OR
  the bit-identity canary fails — forced output still feeds the shared,
  backend-agnostic episode cache, so non-identical output is an error,
  not a preference).
* ``0``: force the PIL path.

Non-JPEG files, CMYK JPEGs, and any per-file decode failure fall back to
the PIL path per item (the C side reports a status code per file).
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_DIR, "decode.c")
_SO = os.path.join(_DIR, "libmftdecode.so")
_ABI = 1

# status codes mirrored from decode.c
OK = 0
ERR_DECODE = 1
ERR_NOT_JPEG = 2
ERR_IO = 3
ERR_UNSUPPORTED = 4
ERR_TRUNCATED = 5  # damaged stream: synthesized pixels would be backend-defined

_lock = threading.Lock()
_lib = None
_lib_tried = False
_canary_ok: bool | None = None


def build(force: bool = False) -> bool:
    """Compile ``decode.c`` -> ``libmftdecode.so``.  Returns True on success."""
    if not force and os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    tmp = f"{_SO}.{os.getpid()}.tmp"  # pid-unique: concurrent builders must not interleave
    for cc in ("gcc", "cc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", _SRC, "-o", tmp, "-ljpeg", "-lpthread"],
                capture_output=True,
                text=True,
                timeout=120,
            )
        except (OSError, subprocess.TimeoutExpired):
            continue
        if r.returncode == 0:
            os.replace(tmp, _SO)
            return True
    if os.path.exists(tmp):
        os.unlink(tmp)
    return False


def _load():
    """Load (building if needed) the shared library; None if unavailable."""
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        try:
            if lib.mft_abi_version() != _ABI:
                if not build(force=True):
                    return None
                lib = ctypes.CDLL(_SO)
                if lib.mft_abi_version() != _ABI:
                    return None
        except AttributeError:
            return None
        lib.mft_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.mft_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.mft_resample_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def decode_jpeg_bytes(data: bytes, base_size: int, draft: bool = True) -> np.ndarray | None:
    """Native decode of one in-memory JPEG to uint8 [base, base, 3]; None on
    any failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((base_size, base_size, 3), np.uint8)
    rc = lib.mft_decode_jpeg(data, len(data), base_size, int(draft), out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == OK else None


def resample_rgb(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray | None:
    """Native PIL-equivalent antialiased bilinear resample (tests/bench)."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w = arr.shape[:2]
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.mft_resample_rgb(
        arr.ctypes.data_as(ctypes.c_void_p), w, h, out.ctypes.data_as(ctypes.c_void_p), out_w, out_h
    )
    return out if rc == 0 else None


def decode_batch(paths, base_size: int, draft: bool = True, threads: int = 16):
    """Native parallel decode of ``paths`` (list of str).  Returns
    (images uint8 [n, base, base, 3], status int32 [n]) or None if the
    library is unavailable.  Nonzero statuses mark files the caller must
    decode via the PIL fallback."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, base_size, base_size, 3), np.uint8)
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.mft_decode_batch(
        arr, n, base_size, int(draft), int(threads),
        out.ctypes.data_as(ctypes.c_void_p), status.ctypes.data_as(ctypes.c_void_p),
    )
    return out, status


def _pil_reference(data: bytes, base_size: int) -> np.ndarray:
    """The PIL path of pipeline.decode_image, on in-memory bytes."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    with Image.open(io.BytesIO(data)) as im:
        im.draft("RGB", (base_size, base_size))
        im = im.convert("RGB").resize((base_size, base_size), Image.BILINEAR)
        return np.asarray(im, np.uint8)


def _canary() -> bool:
    """Prove the native path bit-identical to PIL on representative JPEGs.
    Covers every draft scale {8, 4, 2, 1}, grayscale, a progressive stream,
    and 4:4:4 chroma subsampling — the decode-path variants whose libjpeg
    behavior could diverge between PIL's bundled libjpeg-turbo and a host's
    system libjpeg (the test suite pins these on THIS host; the canary makes
    the same guarantee on every user host, once per process, a few ms).
    Runs once per process."""
    global _canary_ok
    if _canary_ok is not None:
        return _canary_ok
    try:
        from PIL import Image

        rs = np.random.RandomState(0)
        cases = []
        # (w, h, mode, save kwargs): at base=64 the draft scale is
        # min(w//64, h//64) snapped down to {8,4,2,1}
        for (w, h, mode, kw) in [
            (600, 400, "RGB", {}),                       # scale 4, 4:2:0
            (160, 120, "RGB", {}),                       # scale 1
            (300, 200, "L", {}),                         # scale 2, grayscale
            (640, 560, "RGB", {"subsampling": 0}),       # scale 8, 4:4:4
            (520, 260, "RGB", {"progressive": True}),    # scale 4, progressive
            (200, 140, "RGB", {"subsampling": 2}),       # scale 2, 4:2:0 explicit
        ]:
            src = rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(src).convert(mode).save(buf, "JPEG", quality=88, **kw)
            cases.append(buf.getvalue())
        base = 64
        ok = True
        for data in cases:
            native = decode_jpeg_bytes(data, base, draft=True)
            if native is None or not np.array_equal(native, _pil_reference(data, base)):
                ok = False
                break
        _canary_ok = ok
    except Exception:
        _canary_ok = False
    return _canary_ok


def backend() -> str:
    """'native' or 'pil' per MFT_NATIVE_DECODE (see module docstring)."""
    mode = os.environ.get("MFT_NATIVE_DECODE", "auto").lower()
    if mode in ("0", "off", "pil"):
        return "pil"
    if mode in ("1", "on", "native"):
        if _load() is None:
            raise RuntimeError("MFT_NATIVE_DECODE=1 but the native decode library is unavailable")
        if not _canary():
            # forced mode must still be bit-identical: the decoded-episode
            # cache key deliberately excludes the backend (pipeline._cache_key
            # relies on the two producing the same bytes), so a non-identical
            # native decode would silently poison caches later read by PIL
            # runs.  auto mode falls back quietly; forced mode fails loudly.
            raise RuntimeError(
                "MFT_NATIVE_DECODE=1 but the native decode canary is not "
                "bit-identical to PIL on this host (likely a libjpeg variant "
                "mismatch); use MFT_NATIVE_DECODE=auto (falls back to PIL) or 0"
            )
        return "native"
    return "native" if _load() is not None and _canary() else "pil"


def decode_many(items, base_size: int, *, pool, workers: int, fallback) -> list:
    """Decode a heterogeneous item list (paths and/or in-memory arrays) to a
    list of uint8 [base, base, 3] arrays, preserving order.

    File paths go through the native pthread batch when the backend is
    'native'; array items, non-JPEG files, and any per-file native failure
    go through ``fallback`` (pipeline.decode_image) on the Python thread
    ``pool``.  When the backend is 'pil' everything uses the pool — the
    original behavior, byte for byte.
    """
    path_idx = [i for i, it in enumerate(items) if isinstance(it, (str, os.PathLike))]
    use_native = bool(path_idx) and backend() == "native"
    out: list = [None] * len(items)
    if use_native:
        draft = os.environ.get("MFT_DRAFT_DECODE", "1") != "0"
        res = decode_batch([items[i] for i in path_idx], base_size, draft=draft, threads=workers)
        if res is None:
            use_native = False
        else:
            imgs, status = res
            for k, i in enumerate(path_idx):
                if status[k] == OK:
                    out[i] = imgs[k]
    rest = [i for i in range(len(items)) if out[i] is None]
    if rest:
        for i, img in zip(rest, pool.map(lambda i: fallback(items[i], base_size), rest)):
            out[i] = img
    return out
