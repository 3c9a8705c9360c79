"""ctypes bindings for the native host-IO runtime (tpupose/native/io.cc).

Builds libtpupose_io.so on first use (g++ is in the image; pybind11 is
not, so bindings are plain ctypes per the environment constraints).
Falls back to PIL transparently when the toolchain or libjpeg is absent —
callers never need to care.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from tpupose.utils.logging import printT, printW

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libtpupose_io.so"))
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing g++/libjpeg -> fall back
        printW(f"native io build failed ({e}); using PIL fallback")
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            printW(f"native io load failed ({e}); using PIL fallback")
            return None
        # a stale .so built before a symbol was added must not crash the
        # loader path — rebuild once, else fall back to PIL
        # tp_io_version gates ABI changes: a .so built before a signature
        # change lacks the marker and is rebuilt instead of crashing
        needed = ("tp_decode_jpeg_resize", "tp_decode_jpeg_batch",
                  "tp_parse_yolo_label", "tp_decode_warp_batch",
                  "tp_decode_prescaled_batch", "tp_warp_batch",
                  "tp_io_version")
        if not all(hasattr(lib, s) for s in needed):
            printW("native io library is stale (missing symbols); rebuilding")
            del lib
            try:
                os.remove(_SO)
            except OSError:
                pass
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError as e:
                printW(f"native io reload failed ({e}); using PIL fallback")
                return None
            if not all(hasattr(lib, s) for s in needed):
                printW("rebuilt native io still lacks symbols; PIL fallback")
                return None
        lib.tp_decode_jpeg_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.tp_decode_jpeg_resize.restype = ctypes.c_int
        lib.tp_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.tp_decode_jpeg_batch.restype = ctypes.c_int
        lib.tp_parse_yolo_label.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        lib.tp_parse_yolo_label.restype = ctypes.c_int
        lib.tp_decode_warp_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.tp_decode_warp_batch.restype = ctypes.c_int
        _u8p = ctypes.POINTER(ctypes.c_uint8)
        _i32p = ctypes.POINTER(ctypes.c_int)
        lib.tp_decode_prescaled_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(_u8p), ctypes.POINTER(ctypes.c_long),
            _i32p, _i32p, _i32p, _i32p, ctypes.c_int, _u8p]
        lib.tp_decode_prescaled_batch.restype = ctypes.c_int
        lib.tp_warp_batch.argtypes = [
            ctypes.POINTER(_u8p), _i32p, _i32p, _i32p, _i32p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, _u8p, ctypes.c_int]
        lib.tp_warp_batch.restype = ctypes.c_int
        _lib = lib
        printT("native io runtime loaded")
        return _lib


def decode_jpeg_batch(paths, out_h: int, out_w: int,
                      num_threads: int = 8) -> np.ndarray:
    """Decode+stretch-resize a list of JPEGs to (N, out_h, out_w, 3) uint8.
    Native threaded path when available, PIL otherwise."""
    lib = get_lib()
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    if lib is not None and n:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        fails = lib.tp_decode_jpeg_batch(
            arr, n, out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
        if fails:
            printW(f"native decode: {fails}/{n} failures (zero-filled)")
        return out
    from PIL import Image

    for i, p in enumerate(paths):
        out[i] = np.asarray(
            Image.open(p).convert("RGB").resize((out_w, out_h)), np.uint8)
    return out


def parse_yolo_label(path: str, cols: int, max_rows: int = 256):
    """Parse one YOLO label txt -> (rows, cols) float32, or None if
    malformed (the check_file behavior). Falls back to numpy parsing."""
    lib = get_lib()
    if lib is not None:
        buf = np.zeros((max_rows, cols), np.float32)
        r = lib.tp_parse_yolo_label(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_rows, cols)
        if r == -2:
            return np.zeros((0, cols), np.float32)
        if r < 0:
            return None
        if r > max_rows:
            # the file holds more rows than the buffer: re-read with an
            # exact-size buffer so no instance is silently dropped (the
            # Python fallback returns all rows; the native path must too)
            buf = np.zeros((r, cols), np.float32)
            r = lib.tp_parse_yolo_label(
                path.encode(),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), r, cols)
            if r < 0:
                return None
        return buf[:r].copy()
    # python fallback
    if not os.path.exists(path):
        return np.zeros((0, cols), np.float32)
    rows = []
    with open(path) as f:
        for ln in f:
            vals = ln.split()
            if not vals:
                continue
            if len(vals) != cols:
                return None
            rows.append([float(v) for v in vals])
    return np.asarray(rows, np.float32).reshape(-1, cols)


def _prescale_dims(full_w: int, full_h: int, shrink: float):
    """Predict libjpeg's DCT-prescaled output dims for a given shrink —
    mirrors decode_jpeg's scale_num selection (io.cc): the largest num
    with 8/(num-1) > shrink, output dim = ceil(dim*num/8)."""
    num = 8
    while num > 1 and 8.0 / (num - 1) <= max(shrink, 1.0):
        num -= 1
    return (full_w * num + 7) // 8, (full_h * num + 7) // 8, num


def decode_prescaled_batch(paths, shrinks, caps_hw, num_threads: int = 8):
    """Threaded DCT-prescaled decode into fresh per-item buffers (the
    decode-once half of the epoch cache).

    paths: N jpeg paths; shrinks: N source-pixels-per-crop-pixel factors;
    caps_hw: N (full_w, full_h) hints (from the annotation file) used to
    size the buffers via _prescale_dims. Returns a list of N entries
    (img (h, w, 3) uint8 trimmed to the real decoded dims, full_w,
    full_h) with None for failed slots, or None when the native library
    is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    bufs, caps = [], np.empty(n, np.int64)
    for i, (fw, fh) in enumerate(caps_hw):
        pw, ph, _ = _prescale_dims(int(fw), int(fh), float(shrinks[i]))
        # slack for annotation dims being off by a little
        bufs.append(np.empty(((ph + 8) * (pw + 8) * 3,), np.uint8))
        caps[i] = bufs[i].size
    u8p = ctypes.POINTER(ctypes.c_uint8)
    outs = (u8p * n)(*[b.ctypes.data_as(u8p) for b in bufs])
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    sh = np.ascontiguousarray(np.asarray(shrinks, np.float32))
    ws = np.zeros(n, np.int32)
    hs = np.zeros(n, np.int32)
    fws = np.zeros(n, np.int32)
    fhs = np.zeros(n, np.int32)
    ok = np.ones(n, np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.tp_decode_prescaled_batch(
        arr, sh.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, outs,
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ws.ctypes.data_as(i32p), hs.ctypes.data_as(i32p),
        fws.ctypes.data_as(i32p), fhs.ctypes.data_as(i32p),
        num_threads, ok.ctypes.data_as(u8p))
    res = []
    for i in range(n):
        if not ok[i]:
            res.append(None)
            continue
        w, h = int(ws[i]), int(hs[i])
        # copy: trims the allocation slack so a cache's byte accounting
        # is honest, and frees the oversized backing buffer
        img = bufs[i][:h * w * 3].reshape(h, w, 3).copy()
        res.append((img, int(fws[i]), int(fhs[i])))
    return res


def warp_batch(sources, matrices, out_h: int, out_w: int,
               num_threads: int = 8):
    """Threaded affine crop from already-decoded (prescaled) sources (the
    warp-per-epoch half of the cache). sources: N (img (h, w, 3) uint8
    C-contiguous, full_w, full_h); matrices: (N, 2, 3) dst->src in
    full-res coords. Returns (N, out_h, out_w, 3) uint8, or None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(sources)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    srcs = (u8p * n)(*[s[0].ctypes.data_as(u8p) for s in sources])
    ws = np.asarray([s[0].shape[1] for s in sources], np.int32)
    hs = np.asarray([s[0].shape[0] for s in sources], np.int32)
    fws = np.asarray([s[1] for s in sources], np.int32)
    fhs = np.asarray([s[2] for s in sources], np.int32)
    mats = np.ascontiguousarray(
        np.asarray(matrices, np.float32).reshape(n, 6))
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.tp_warp_batch(
        srcs, ws.ctypes.data_as(i32p), hs.ctypes.data_as(i32p),
        fws.ctypes.data_as(i32p), fhs.ctypes.data_as(i32p),
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        out_h, out_w, out.ctypes.data_as(u8p), num_threads)
    return out


def decode_warp_batch(paths, matrices, out_h: int, out_w: int,
                      num_threads: int = 8):
    """Fused JPEG decode + 2x3 affine crop on the C++ thread pool.

    paths: N file paths; matrices: (N, 2, 3) float32 dst->src in FULL-RES
    source pixels. Returns (images (N, out_h, out_w, 3) uint8, ok (N,)
    bool — False for slots whose decode failed and was zero-filled, so
    callers can invalidate the labels too), or None when the native
    library is unavailable (callers fall back to the PIL path).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    mats = np.ascontiguousarray(np.asarray(matrices, np.float32).reshape(n, 6))
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.ones(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = lib.tp_decode_warp_batch(
        arr, mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        out_h, out_w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads, ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if fails:
        printW(f"native decode+warp: {fails}/{n} failures "
               f"(zero-filled, labels invalidated)")
    return out, ok.astype(bool)
