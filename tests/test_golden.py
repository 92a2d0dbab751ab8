"""Vendored golden-coefficient tests.

The fixture (tests/golden/golden.npz, generated once by
tools/gen_golden.py) holds coefficients computed by a scalar-loop
transliteration of the reference kernels' index arithmetic — an oracle
with NO shared code with the vectorized engines or tests/np_oracle.py.
Matching it pins the coefficient convention as a tested fact
(reference compatibility claim: /root/reference/README.md:25).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as sep
from pdwt_tpu.core.separable import Coeffs1D, Coeffs2D
from pdwt_tpu.filters import get_wavelet

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden.npz"))

BACKENDS = ("fma", "xla", "gather")


def _close(actual, expected, tol=1e-10):
    err = float(np.abs(np.asarray(actual, np.float64) - expected).max())
    assert err < tol, f"max err {err:.3e}"


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize(
    "wname", ("haar", "db2", "db7", "bior4.4", "db3", "sym8"))
def test_dwt2d_matches_golden(wname, backend):
    w = get_wavelet(wname)
    x = jnp.asarray(GOLD[f"dwt2d/{wname}/x"])
    levels = int(GOLD[f"dwt2d/{wname}/levels"])
    c = sep.dwt2d(x, w, levels, backend=backend)
    _close(c.approx, GOLD[f"dwt2d/{wname}/a"])
    for lvl in range(1, levels + 1):
        h, v, d = c.details[lvl - 1]
        _close(h, GOLD[f"dwt2d/{wname}/L{lvl}/h"])
        _close(v, GOLD[f"dwt2d/{wname}/L{lvl}/v"])
        _close(d, GOLD[f"dwt2d/{wname}/L{lvl}/d"])


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("wname,m", (("db7", 16), ("bior4.4", 12),
                                     ("haar", 8)))
def test_idwt2d_matches_golden(wname, m, backend):
    w = get_wavelet(wname)
    g = lambda k: jnp.asarray(GOLD[f"idwt2d/{wname}/{k}"])
    c = Coeffs2D(g("a"), ((g("h"), g("v"), g("d")),))
    y = sep.idwt2d(c, w, (2 * m, 2 * m), backend=backend)
    _close(y, GOLD[f"idwt2d/{wname}/y"])


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("wname", ("db4", "haar"))
def test_swt2d_matches_golden(wname, backend):
    w = get_wavelet(wname)
    x = jnp.asarray(GOLD[f"swt2d/{wname}/x"])
    c = sep.swt2d(x, w, 2, backend=backend)
    _close(c.approx, GOLD[f"swt2d/{wname}/a"])
    for lvl in (1, 2):
        h, v, d = c.details[lvl - 1]
        _close(h, GOLD[f"swt2d/{wname}/L{lvl}/h"])
        _close(v, GOLD[f"swt2d/{wname}/L{lvl}/v"])
        _close(d, GOLD[f"swt2d/{wname}/L{lvl}/d"])


@pytest.mark.parametrize("backend", BACKENDS)
def test_iswt2d_matches_golden(backend):
    w = get_wavelet("db4")
    g = lambda k: jnp.asarray(GOLD[f"iswt2d/db4/{k}"])
    c = Coeffs2D(g("a"), ((g("h"), g("v"), g("d")),))
    y = sep.iswt2d(c, w, backend=backend)
    _close(y, GOLD["iswt2d/db4/y"])


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("wname", ("sym4", "db2", "db5"))
def test_dwt1d_matches_golden(wname, backend):
    w = get_wavelet(wname)
    x = jnp.asarray(GOLD[f"dwt1d/{wname}/x"])
    levels = int(GOLD[f"dwt1d/{wname}/levels"])
    c = sep.dwt1d(x, w, levels, backend=backend)
    _close(c.approx, GOLD[f"dwt1d/{wname}/a"])
    for lvl in range(1, levels + 1):
        _close(c.details[lvl - 1], GOLD[f"dwt1d/{wname}/L{lvl}/d"])


@pytest.mark.parametrize("backend", BACKENDS)
def test_swt1d_matches_golden(backend):
    w = get_wavelet("db2")
    x = jnp.asarray(GOLD["swt1d/db2/x"])
    c = sep.swt1d(x, w, 2, backend=backend)
    _close(c.approx, GOLD["swt1d/db2/a"])
    for lvl in (1, 2):
        _close(c.details[lvl - 1], GOLD[f"swt1d/db2/L{lvl}/d"])
