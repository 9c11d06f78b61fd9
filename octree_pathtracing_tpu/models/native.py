"""ctypes binding + on-demand build of the native .mca parser.

The shared library compiles lazily from ``native/mca_parser.cc`` with the
system g++ (cached next to the source); if the toolchain or zlib is missing,
callers fall back to the numpy parser in ``mca.py``.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "mca_parser.cc")
_SO = os.path.join(_NATIVE_DIR, "libmca_parser.so")

_lock = threading.Lock()
_lib = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _SO,
        "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


ABI_VERSION = 2  # protocol v2: per-section biome palette + cell tail


def get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.native_abi_version.restype = ctypes.c_int64
            if lib.native_abi_version() != ABI_VERSION:
                raise RuntimeError(
                    f"stale libmca_parser.so (abi "
                    f"{lib.native_abi_version()} != {ABI_VERSION}) — delete "
                    f"{_SO} to rebuild"
                )
            lib.parse_region.restype = ctypes.c_int64
            lib.parse_region.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.c_int64,
            ]
            _lib = lib
    return _lib


def parse_region_native(buf: bytes):
    """Parse an .mca blob via the C++ library; returns [Section] (mca.Section)."""
    from .mca import Section

    lib = get_lib()
    cap = max(len(buf) * 4, 1 << 20)
    out = ctypes.create_string_buffer(cap)
    n = lib.parse_region(buf, len(buf), out, cap)
    if n < 0:
        if n == -1:
            raise ValueError("malformed region file")
        cap = -n
        out = ctypes.create_string_buffer(cap)
        n = lib.parse_region(buf, len(buf), out, cap)
        if n < 0:
            raise ValueError("native parse failed")
    blob = out.raw
    sections = []
    pos = 0
    for _ in range(n):
        cx, cz, y_pos, pcount = struct.unpack_from("<iiii", blob, pos)
        pos += 16
        palette = []
        for _ in range(pcount):
            (ln,) = struct.unpack_from("<H", blob, pos)
            pos += 2
            palette.append(blob[pos : pos + ln].decode("utf-8", "replace"))
            pos += ln
        indices = np.frombuffer(blob, "<u2", 4096, pos).copy()
        pos += 8192
        (bcount,) = struct.unpack_from("<i", blob, pos)
        pos += 4
        b_pal = None
        b_idx = None
        if bcount > 0:
            b_pal = []
            for _ in range(bcount):
                (ln,) = struct.unpack_from("<H", blob, pos)
                pos += 2
                b_pal.append(blob[pos : pos + ln].decode("utf-8", "replace"))
                pos += ln
            b_idx = np.frombuffer(blob, "<u2", 64, pos).copy()
            pos += 128
        sections.append(
            Section(
                chunk_x=cx,
                chunk_z=cz,
                y_pos=y_pos,
                palette=palette,
                indices=indices,
                biome_palette=b_pal,
                biome_indices=b_idx,
            )
        )
    return sections
