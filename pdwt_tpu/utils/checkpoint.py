"""Coefficient checkpoint / resume.

The reference has no persistence; its primitives are get_coeff/set_coeff
round-trips (reference: src/wt.cu:437-508).  Here the coefficient pytree
is ordinary arrays, so checkpointing is a flat .npz with the tree
structure encoded in the keys — loadable with plain numpy anywhere.
"""
from __future__ import annotations

from typing import Tuple, Union

import numpy as np

from ..core.separable import Coeffs1D, Coeffs2D

Coeffs = Union[Coeffs1D, Coeffs2D]


def save_coeffs(path: str, coeffs: Coeffs) -> None:
    """Write a coefficient pytree to ``path`` (.npz)."""
    data = {"approx": np.asarray(coeffs.approx)}
    if isinstance(coeffs, Coeffs2D):
        data["ndim"] = np.int64(2)
        for i, (h, v, d) in enumerate(coeffs.details):
            data[f"h{i}"] = np.asarray(h)
            data[f"v{i}"] = np.asarray(v)
            data[f"d{i}"] = np.asarray(d)
    else:
        data["ndim"] = np.int64(1)
        for i, d in enumerate(coeffs.details):
            data[f"d{i}"] = np.asarray(d)
    data["levels"] = np.int64(coeffs.levels)
    np.savez(path, **data)


def load_coeffs(path: str) -> Coeffs:
    """Load a coefficient pytree written by :func:`save_coeffs`."""
    with np.load(path) as z:
        levels = int(z["levels"])
        ndim = int(z["ndim"])
        approx = z["approx"]
        if ndim == 2:
            details = tuple(
                (z[f"h{i}"], z[f"v{i}"], z[f"d{i}"]) for i in range(levels)
            )
            return Coeffs2D(approx, details)
        return Coeffs1D(approx, tuple(z[f"d{i}"] for i in range(levels)))
