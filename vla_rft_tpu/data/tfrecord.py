"""TFRecord IO: C++ scanner (csrc/libtfrecord.so via ctypes) with a pure-
python fallback.

The reference reads LIBERO RLDS tfrecords through TensorFlow/dlimp
(prismatic/vla/datasets/datasets.py:128-219); here record framing is parsed
natively and payloads are sliced zero-copy from an mmap — no TF dependency on
the hot path (TF remains available for tf.train.Example decode if installed).
"""
from __future__ import annotations

import ctypes
import mmap
import os
import struct
import subprocess
from typing import Iterator, List, Optional, Tuple

_LIB: Optional[ctypes.CDLL] = None
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_CSRC, "libtfrecord.so"))
    if not os.path.exists(so):
        try:  # build on first use
            subprocess.run(["make", "-C", os.path.abspath(_CSRC)], check=True,
                           capture_output=True)
        except Exception:
            return None
    if os.path.exists(so):
        lib = ctypes.CDLL(so)
        lib.tfrecord_scan.restype = ctypes.c_long
        lib.tfrecord_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
            ctypes.c_long, ctypes.c_int,
        ]
        lib.tfrecord_write.restype = ctypes.c_long
        lib.tfrecord_write.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p]
        _LIB = lib
    return _LIB


# --------------------------------------------------------------- crc (python)
def _crc32c_py(data: bytes) -> int:
    poly = 0x82F63B78
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def _masked_crc_py(data: bytes) -> int:
    crc = _crc32c_py(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def scan_records(path: str, verify_crc: bool = False) -> List[Tuple[int, int]]:
    """Return [(offset, length)] of record payloads in a tfrecord file."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        buf = f.read()
    lib = _load_lib()
    if lib is not None:
        max_n = max(16, size // 16)
        offs = (ctypes.c_long * max_n)()
        lens = (ctypes.c_long * max_n)()
        n = lib.tfrecord_scan(buf, size, offs, lens, max_n, int(verify_crc))
        if n < 0:
            raise ValueError(f"corrupt tfrecord: {path}")
        return [(offs[i], lens[i]) for i in range(n)]
    # python fallback
    out = []
    pos = 0
    while pos + 12 <= size:
        (length,) = struct.unpack("<Q", buf[pos : pos + 8])
        if verify_crc:
            (crc,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
            if _masked_crc_py(buf[pos : pos + 8]) != crc:
                raise ValueError(f"corrupt tfrecord length crc: {path}")
        start = pos + 12
        out.append((start, length))
        pos = start + length + 4
    return out


def read_records(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        for off, length in scan_records(path, verify_crc):
            yield mm[off : off + length]


def write_records(path: str, payloads: List[bytes]) -> None:
    """TFRecord writer (framing via the C++ lib when available)."""
    lib = _load_lib()
    with open(path, "wb") as f:
        for p in payloads:
            if lib is not None:
                out = ctypes.create_string_buffer(len(p) + 16)
                n = lib.tfrecord_write(p, len(p), out)
                f.write(out.raw[:n])
            else:
                header = struct.pack("<Q", len(p))
                f.write(header)
                f.write(struct.pack("<I", _masked_crc_py(header)))
                f.write(p)
                f.write(struct.pack("<I", _masked_crc_py(p)))
