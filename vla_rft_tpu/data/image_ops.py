"""Native image ops: threaded JPEG decode + resize + crop/flip (ctypes over
csrc/image_ops.cc).

First-party replacement for the TF image ops the reference's data pipeline
uses (prismatic/vla/datasets/datasets.py:206 tf.io.decode_image, dlimp
augmentations).  Python keeps the RNG/policy (crop boxes, flip flags) so
augmentation stays reproducible; C++ does the pixel work off the GIL.
Falls back to PIL when the shared library isn't built.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
        "libimage_ops.so",
    )
    try:
        lib = ctypes.CDLL(path)
        lib.decode_jpeg_resize_batch.restype = ctypes.c_int
        lib.decode_jpeg_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.crop_resize_flip_batch.restype = None
        lib.crop_resize_flip_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _load() is not None


def jpeg_dims(b: bytes) -> Optional[tuple]:
    """(h, w) from the JPEG SOF header, no decode (no TF probe needed)."""
    i = 2
    n = len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return (b[i + 5] << 8 | b[i + 6], b[i + 7] << 8 | b[i + 8])
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        i += 2 + (b[i + 2] << 8 | b[i + 3])
    return None


def decode_jpeg_batch(
    encoded: List[bytes], out_h: int, out_w: int, threads: int = 8
) -> np.ndarray:
    """JPEG bytes -> (n, out_h, out_w, 3) u8 (bilinear resize when needed)."""
    lib = _load()
    n = len(encoded)
    out = np.zeros((n, out_h, out_w, 3), np.uint8)
    if lib is None:
        import io

        from PIL import Image

        for i, b in enumerate(encoded):
            img = Image.open(io.BytesIO(b)).convert("RGB")
            if img.size != (out_w, out_h):
                img = img.resize((out_w, out_h), Image.BILINEAR)
            out[i] = np.asarray(img, np.uint8)
        return out

    bufs = (ctypes.c_char_p * n)(*encoded)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in encoded])
    ok = lib.decode_jpeg_resize_batch(
        bufs, lens, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, threads,
    )
    if ok != n:
        # Some slot failed (corrupt JPEG or larger than the C++ bound) and
        # would otherwise ship as a silent black frame.  Re-decode through
        # PIL, which raises on genuinely corrupt data instead of zero-filling.
        import io

        from PIL import Image

        for i, b in enumerate(encoded):
            img = Image.open(io.BytesIO(b)).convert("RGB")
            if img.size != (out_w, out_h):
                img = img.resize((out_w, out_h), Image.BILINEAR)
            out[i] = np.asarray(img, np.uint8)
    return out


def resize_bilinear_batch(images: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(n, h, w, 3) u8 -> (n, out_h, out_w, 3) u8 bilinear resize (full-image
    "crop" through crop_resize_flip_batch — C++ threaded, PIL fallback).
    Matches the reference's filtered resizes (processing_prismatic.py:38-90,
    tf.image.resize in datasets.py) where round 1 used nearest-neighbor."""
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, _ = images.shape
    if (h, w) == (out_h, out_w):
        return images
    zeros = np.zeros(n, np.int32)
    return crop_resize_flip_batch(
        images, zeros, zeros, np.full(n, h, np.int32), np.full(n, w, np.int32),
        np.zeros(n, np.uint8), out_h, out_w,
    )


def crop_resize_flip_batch(
    images: np.ndarray,  # (n, h, w, 3) u8
    y0: np.ndarray,
    x0: np.ndarray,
    ch: np.ndarray,
    cw: np.ndarray,
    flip: np.ndarray,
    out_h: int,
    out_w: int,
    threads: int = 8,
) -> np.ndarray:
    """Batched random-resized-crop + horizontal flip with caller-supplied
    boxes (so augmentation RNG stays in Python/numpy)."""
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, _ = images.shape
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    lib = _load()
    if lib is None:
        from PIL import Image

        for i in range(n):
            cy, cx = int(y0[i]), int(x0[i])
            chh, cww = int(ch[i]), int(cw[i])
            crop = images[i, cy : cy + chh, cx : cx + cww]
            img = Image.fromarray(crop).resize((out_w, out_h), Image.BILINEAR)
            a = np.asarray(img, np.uint8)
            out[i] = a[:, ::-1] if flip[i] else a
        return out

    as_i32 = lambda a: np.ascontiguousarray(a, np.int32)
    y0c, x0c, chc, cwc = map(as_i32, (y0, x0, ch, cw))
    flipc = np.ascontiguousarray(flip, np.uint8)
    pi = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    lib.crop_resize_flip_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        pi(y0c), pi(x0c), pi(chc), pi(cwc),
        flipc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w, threads,
    )
    return out
