"""Pallas fused level kernels vs the gather oracle.

These only run on a real TPU (Mosaic kernels don't execute on the CPU
backend); the CPU suite covers the identical semantics via the fma/xla
backends, and the driver's TPU bench exercises this path end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as sep
from pdwt_tpu.filters import get_wavelet

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels need a TPU")


def _max_err(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize("wname", ["haar", "db7", "db20", "bior4.4"])
def test_pallas_level_matches_gather(rng, wname):
    w = get_wavelet(wname)
    x = jnp.asarray(rng.standard_normal((2, 256, 256)), dtype=jnp.float32)
    cp = sep.dwt2d(x, w, 2, backend="pallas")
    cg = sep.dwt2d(x, w, 2, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.idwt2d(cp, w, (256, 256), backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


def test_pallas_fallback_geometry(rng):
    """Odd sizes route through the fma fallback inside the pallas path."""
    w = get_wavelet("db3")
    x = jnp.asarray(rng.standard_normal((1, 94, 190)), dtype=jnp.float32)
    cp = sep.dwt2d(x, w, 2, backend="pallas")
    cg = sep.dwt2d(x, w, 2, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.idwt2d(cp, w, (94, 190), backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4
