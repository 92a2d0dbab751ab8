"""Non-separable engine: PR, equality with the separable engine, custom quads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import nonseparable as NS
from pdwt_tpu.core import separable as S
from pdwt_tpu.filters import get_wavelet, quad_filters


def _quads(wname):
    w = get_wavelet(wname)
    return (quad_filters(w.dec_lo, w.dec_hi),
            quad_filters(w.rec_lo, w.rec_hi))


@pytest.mark.parametrize("shape", [(64, 64), (63, 65)])
def test_ns_perfect_reconstruction(wname, shape, rng):
    qf, qi = _quads(wname)
    levels = 2 if min(shape) >= (qf.shape[-1] - 1) * 4 else 1
    x = jnp.asarray(rng.standard_normal(shape))
    c = NS.dwt2d_ns(x, qf, levels)
    xr = NS.idwt2d_ns(c, qi, shape)
    err = float(jnp.abs(xr - x).max())
    assert err < 1e-7, (wname, shape, err)


def test_ns_equals_separable(rng):
    for wname in ("db4", "sym6", "bior2.4"):
        w = get_wavelet(wname)
        qf, qi = _quads(wname)
        x = jnp.asarray(rng.standard_normal((52, 44)))
        c_ns = NS.dwt2d_ns(x, qf, 2)
        c_s = S.dwt2d(x, w, 2)
        err = max(float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree_util.tree_leaves(c_ns), jax.tree_util.tree_leaves(c_s)))
        assert err < 1e-9, (wname, err)


def test_ns_swt_perfect_reconstruction(wname, rng):
    qf, qi = _quads(wname)
    x = jnp.asarray(rng.standard_normal((40, 40)))
    c = NS.swt2d_ns(x, qf, 3)
    xr = NS.iswt2d_ns(c, qi)
    err = float(jnp.abs(xr - x).max())
    assert err < 1e-7, (wname, err)


def test_ns_swt_equals_separable_swt(rng):
    w = get_wavelet("db3")
    qf, _ = _quads("db3")
    x = jnp.asarray(rng.standard_normal((36, 36)))
    c_ns = NS.swt2d_ns(x, qf, 2)
    c_s = S.swt2d(x, w, 2)
    err = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(c_ns), jax.tree_util.tree_leaves(c_s)))
    assert err < 1e-9


def test_ns_custom_nonseparable_quads(rng):
    """Truly non-separable 2D filters (not outer products) still give PR
    when built from a separable PR pair by mixing: here we just rotate the
    quad roles consistently, exercising arbitrary user quads
    (reference: w_set_filters_*_nonseparable, src/nonseparable.cu:86-106)."""
    w = get_wavelet("db2")
    qf = quad_filters(w.dec_lo, w.dec_hi, transpose_detail_convention=True)
    qi = quad_filters(w.rec_lo, w.rec_hi, transpose_detail_convention=True)
    x = jnp.asarray(rng.standard_normal((33, 47)))
    c = NS.dwt2d_ns(x, qf, 2)
    xr = NS.idwt2d_ns(c, qi, (33, 47))
    assert float(jnp.abs(xr - x).max()) < 1e-7
    # with the transposed convention, H and V swap relative to separable
    c_s = S.dwt2d(x, w, 1)
    c_t = NS.dwt2d_ns(x, qf, 1)
    assert float(jnp.abs(c_t.details[0][0] - c_s.details[0][1]).max()) < 1e-9


def test_ns_bad_quads_rejected():
    with pytest.raises(ValueError, match="quads"):
        NS.dwt2d_ns(jnp.zeros((8, 8)), np.zeros((3, 4, 4)), 1)
