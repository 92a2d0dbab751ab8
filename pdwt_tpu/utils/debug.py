"""NaN/shape sanitizers — the functional analogue of CUDA sanitizers.

The reference has no error checking at all (its CUDACHECK macro is never
invoked, reference: src/wt.cu:14-21; SURVEY.md §5).  JAX's functional
model rules out data races by construction; what remains worth guarding
is numeric poison (NaN/Inf propagating silently through a pipeline) and
coefficient-pytree geometry.  Tools:

* ``assert_finite(tree, name)`` — jittable check via ``checkify``; use
  ``checked(fn)`` to get a callable that raises on the host.
* ``validate_coeffs(coeffs, nr, nc, levels, swt)`` — host-side shape
  audit of a coefficient pytree against the reference layout rules
  (``w_div2`` round-up sizes, reference: src/common.cu:400-445).
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..core.separable import Coeffs1D, Coeffs2D
from ..core.shapes import coeff_shapes_1d, coeff_shapes_2d

Coeffs = Union[Coeffs1D, Coeffs2D]


def assert_finite(tree, name: str = "value") -> None:
    """Inside jit (wrapped by :func:`checked`): error if any leaf holds a
    NaN or Inf."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        ok = jnp.all(jnp.isfinite(leaf))
        checkify.check(ok, f"{name}: leaf {i} contains NaN/Inf")


def checked(fn):
    """Wrap ``fn`` so its ``assert_finite`` checks raise host-side
    ``JaxRuntimeError`` instead of being silently traced away:

    >>> f = checked(lambda x: (assert_finite(x, "input"), x * 2)[1])
    >>> f(jnp.ones(3))            # fine
    >>> f(jnp.array([jnp.nan]))   # raises
    """
    cf = checkify.checkify(fn, errors=checkify.user_checks)

    def run(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        err.throw()
        return out

    return run


def validate_coeffs(coeffs: Coeffs, nr: int, nc: int = None, *,
                    levels: int = None, swt: bool = False,
                    nd: int = None) -> None:
    """Host-side audit: every subband of ``coeffs`` must match the
    reference buffer geometry for an (nr[, nc]) input — or an
    (nd, nr, nc) volume when ``nd`` is given (Coeffs3D).  Raises
    ValueError with the offending level/subband."""
    levels = coeffs.levels if levels is None else levels
    if coeffs.levels != levels:
        raise ValueError(
            f"expected {levels} levels, got {coeffs.levels}")
    from ..core.separable3d import Coeffs3D
    from ..core.shapes import coeff_shapes_3d

    if isinstance(coeffs, Coeffs3D):
        if nd is None:
            raise ValueError("validate_coeffs: Coeffs3D needs nd=")
        app, dets = coeff_shapes_3d(nd, nr, nc, levels, swt)
        if coeffs.approx.shape[-3:] != app:
            raise ValueError(
                f"approx shape {coeffs.approx.shape[-3:]} != {app}")
        for i, (bands, want) in enumerate(zip(coeffs.details, dets)):
            if len(bands) != 7:
                raise ValueError(f"level {i + 1} has {len(bands)} bands")
            for j, arr in enumerate(bands):
                if arr.shape[-3:] != want:
                    raise ValueError(
                        f"level {i + 1} band {j} shape {arr.shape[-3:]} "
                        f"!= {want}")
        return
    if isinstance(coeffs, Coeffs2D):
        app, dets = coeff_shapes_2d(nr, nc, levels, swt)
        if coeffs.approx.shape[-2:] != app:
            raise ValueError(
                f"approx shape {coeffs.approx.shape[-2:]} != {app}")
        for i, (trip, want) in enumerate(zip(coeffs.details, dets)):
            for band, arr in zip("HVD", trip):
                if arr.shape[-2:] != want:
                    raise ValueError(
                        f"level {i + 1} {band} shape {arr.shape[-2:]} "
                        f"!= {want}")
    else:
        app, dets = coeff_shapes_1d(nr, levels, swt)
        if coeffs.approx.shape[-1] != app:
            raise ValueError(
                f"approx length {coeffs.approx.shape[-1]} != {app}")
        for i, (arr, want) in enumerate(zip(coeffs.details, dets)):
            if arr.shape[-1] != want:
                raise ValueError(
                    f"level {i + 1} D length {arr.shape[-1]} != {want}")
