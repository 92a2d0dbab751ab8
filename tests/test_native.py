"""Native C++ CPU engine vs the JAX gather oracle — leaf-for-leaf.

The native engine (cpp/pdwt_cpu.cpp) implements the same transform spec
with double accumulation; agreement must be at float32 roundoff.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdwt_tpu import native
from pdwt_tpu.core import separable as sep
from pdwt_tpu.filters import get_wavelet

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable")


def _diff(a, b):
    return max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize("wname", ["haar", "db7", "bior4.4"])
@pytest.mark.parametrize("shape", [(64, 64), (67, 93)])
def test_native_2d_matches_jax(rng, wname, shape):
    w = get_wavelet(wname)
    x = rng.standard_normal(shape).astype(np.float32)
    cn = native.dwt2d(x, w, 2)
    cj = sep.dwt2d(jnp.asarray(x), w, 2, backend="gather")
    assert _diff(cn, cj) < 1e-5
    yn = native.idwt2d(cn, w, shape)
    assert float(np.abs(yn - x).max()) < 1e-5


@pytest.mark.parametrize("wname", ["db3", "sym8"])
def test_native_swt_matches_jax(rng, wname):
    w = get_wavelet(wname)
    x = rng.standard_normal((48, 80)).astype(np.float32)
    cn = native.dwt2d(x, w, 3, swt=True)
    cj = sep.swt2d(jnp.asarray(x), w, 3, backend="gather")
    assert _diff(cn, cj) < 1e-5
    yn = native.idwt2d(cn, w, (48, 80), swt=True)
    assert float(np.abs(yn - x).max()) < 1e-5


@pytest.mark.parametrize("swt", [False, True])
def test_native_1d_matches_jax(rng, swt):
    w = get_wavelet("sym8")
    x = rng.standard_normal((4, 255)).astype(np.float32)
    cn = native.dwt1d(x, w, 2, swt=swt)
    cj = (sep.swt1d if swt else sep.dwt1d)(jnp.asarray(x), w, 2,
                                           backend="gather")
    assert _diff(cn, cj) < 1e-5
    yn = native.idwt1d(cn, w, 255, swt=swt)
    assert float(np.abs(yn - x).max()) < 1e-5


def test_native_ops(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    st = native.soft_threshold(x, 0.5)
    ref = np.sign(x) * np.maximum(np.abs(x) - 0.5, 0)
    assert np.abs(st - ref).max() < 1e-6
    assert abs(native.norm1(x) - np.abs(x).sum()) < 1e-2
    assert abs(native.norm2sq(x) - (x.astype(np.float64) ** 2).sum()) < 1e-2


def test_native_nonseparable_matches_jax(rng):
    from pdwt_tpu.core import nonseparable as ns
    from pdwt_tpu.filters import quad_filters

    w = get_wavelet("db4")
    qf = quad_filters(w.dec_lo, w.dec_hi)
    qi = quad_filters(w.rec_lo, w.rec_hi)
    x = rng.standard_normal((47, 61)).astype(np.float32)
    cn = native.dwt2d_ns(x, qf, 2)
    cj = ns.dwt2d_ns(jnp.asarray(x), qf, 2)
    assert _diff(cn, cj) < 1e-5
    y = native.idwt2d_ns(cn, qi, (47, 61))
    assert np.abs(y - x).max() < 1e-5
    cs = native.dwt2d_ns(x, qf, 2, swt=True)
    ys = native.idwt2d_ns(cs, qi, (47, 61), swt=True)
    assert np.abs(ys - x).max() < 1e-5


def test_native_extra_ops(rng):
    h, v, d = rng.standard_normal((3, 256)).astype(np.float32)
    gh, gv, gd = native.group_soft_threshold(h, v, d, 0.5)
    nrm = np.sqrt(h * h + v * v + d * d)
    fac = np.where(nrm > 0, np.maximum(1 - 0.5 / nrm, 0), 0)
    assert np.abs(gh - h * fac).max() < 1e-6
    assert np.abs(native.shrink(h, 2.0) - h / 3.0).max() < 1e-6
    assert np.abs(native.axpy(h, v, 1.5) - (h + 1.5 * v)).max() < 1e-6
    assert abs(native.norm_l21(h, v, d) - nrm.astype(np.float64).sum()) < 1e-2
    nrm_a = np.sqrt(h * h + v * v + d * d + gh * gh)
    assert abs(native.norm_l21(h, v, d, a=gh)
               - nrm_a.astype(np.float64).sum()) < 1e-2


@pytest.mark.slow
def test_native_double_precision_build(rng):
    """The double-precision library (libpdwt_cpud.so, the analogue of
    the reference's libpdwtd.so, Makefile:36-39) round-trips at f64
    roundoff and cross-checks the f64 JAX path."""
    import jax.numpy as jnp

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.native import lib as native

    w = get_wavelet("db7")
    x = rng.standard_normal((96, 96))
    native.set_dtype(np.float64)
    try:
        c = native.dwt2d(x, w, 3)
        assert c.approx.dtype == np.float64
        y = native.idwt2d(c, w, (96, 96))
        assert np.abs(y - x).max() < 1e-10          # f64 roundoff
        cj = sep.dwt2d(jnp.asarray(x), w, 3, backend="fma")
        assert np.abs(np.asarray(cj.approx) - c.approx).max() < 1e-10
    finally:
        native.set_dtype(np.float32)


def test_native_3d_matches_jax(rng):
    """The native 3D drivers (no reference counterpart — its README
    lists 3D as the first limitation) cross-check the JAX 3D engine at
    f64 roundoff, DWT and SWT, odd sizes included."""
    import jax
    import jax.numpy as jnp

    from pdwt_tpu.core import separable3d as S3
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.native import lib as native

    w = get_wavelet("db4")
    x = rng.standard_normal((15, 21, 33))
    native.set_dtype(np.float64)
    try:
        for swt in (False, True):
            cn = native.dwt3d(x, w, 2, swt=swt)
            y = native.idwt3d(cn, w, (15, 21, 33), swt=swt)
            assert np.abs(y - x).max() < 1e-10
            cj = (S3.swt3d if swt else S3.dwt3d)(
                jnp.asarray(x), w, 2, backend="gather")
            for a, b in zip(jax.tree.leaves(cn), jax.tree.leaves(cj)):
                assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    finally:
        native.set_dtype(np.float32)


def test_native_garrote_and_firm_match_jax():
    """Native garrote/firm thresholds == the jnp formulas (f64)."""
    if not native.is_available():
        pytest.skip("native toolchain unavailable")
    import jax.numpy as jnp

    from pdwt_tpu.ops.threshold import _firm, _garrote

    from pdwt_tpu.native import lib as nlib

    rng = np.random.default_rng(3)
    x = rng.standard_normal(1000) * 3
    nlib.set_dtype(np.float64)
    try:
        ng = native.garrote_threshold(x, 1.2)
        jg = np.asarray(_garrote(jnp.asarray(x), 1.2))
        np.testing.assert_allclose(ng, jg, atol=1e-12)
        nf = native.firm_threshold(x, 0.8, 2.4)
        jf = np.asarray(_firm(jnp.asarray(x), 0.8, 2.4))
        np.testing.assert_allclose(nf, jf, atol=1e-12)
    finally:
        nlib.set_dtype(np.float32)
