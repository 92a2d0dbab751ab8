"""Raw .dat float I/O — parity with the reference's host I/O helpers
(reference: src/io.cpp:10-41 read/write_dat_file_float).  The library's
I/O contract is deliberately minimal: raw float32 arrays in native byte
order, shape supplied by the caller (reference: README.md:57)."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def read_dat(path: str, shape: Optional[Sequence[int]] = None,
             dtype=np.float32) -> np.ndarray:
    """Read a raw float array; reshape if ``shape`` given."""
    arr = np.fromfile(path, dtype=dtype)
    if shape is not None:
        arr = arr.reshape(tuple(shape))
    return arr


def write_dat(path: str, arr) -> None:
    """Write a raw float32 array (C order)."""
    np.ascontiguousarray(np.asarray(arr, dtype=np.float32)).tofile(path)
