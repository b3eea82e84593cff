"""Native helpers: C data loader for Goxel voxel models.

The reference parses voxel text files with a per-line Python loop
(reference data.py:271-289) — ~2-3 s for the 209k-line castle. The C parser
(goxel_parser.c) does it in milliseconds; it is compiled on first use with
the system compiler and bound via ctypes (no pybind11 in the image), with a
pure-Python fallback when compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Dict, List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.join(_HERE, "goxel_parser.c")
    out = os.path.join(tempfile.gettempdir(), "pr_tpu_goxel_parser.so")
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", out, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(out)
        lib.parse_goxel.restype = ctypes.c_long
        lib.parse_goxel.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_long,
        ]
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def _decode_color(col: int) -> str:
    out = []
    while col:
        out.append(chr(col & 0xFF))
        col >>= 8
    return "".join(out)


def parse_goxel_text(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Parse Goxel text bytes -> (x, y, z int32 arrays, color string per voxel).

    Matches the reference's line filter: the first three tokens must be
    all-digit integers (data.py:286); other lines (comments, headers,
    malformed) are skipped. Color token case is preserved for the exact
    string-keyed material lookup.
    """
    lib = _get_lib()
    if lib is not None:
        cap = data.count(b"\n") + 2
        xs = np.empty(cap, np.int32)
        ys = np.empty(cap, np.int32)
        zs = np.empty(cap, np.int32)
        cols = np.empty(cap, np.uint64)
        n = lib.parse_goxel(
            data, len(data),
            xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            zs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cap,
        )
        uniq, inv = np.unique(cols[:n], return_inverse=True)
        names = [_decode_color(int(c)) for c in uniq]
        return xs[:n], ys[:n], zs[:n], [names[i] for i in inv]

    # Pure-Python fallback (reference data.py:284-288 semantics)
    xs_l: List[int] = []
    ys_l: List[int] = []
    zs_l: List[int] = []
    cols_l: List[str] = []
    for line in data.decode("utf-8", "replace").splitlines():
        params = line.strip().split(" ")
        if (
            len(params) >= 4
            and params[0].isdigit()
            and params[1].isdigit()
            and params[2].isdigit()
        ):
            xs_l.append(int(params[0]))
            ys_l.append(int(params[1]))
            zs_l.append(int(params[2]))
            cols_l.append(params[3])
    return (np.array(xs_l, np.int32), np.array(ys_l, np.int32),
            np.array(zs_l, np.int32), cols_l)
