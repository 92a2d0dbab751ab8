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


def test_quad_factorization_dispatch(rng):
    """Outer-product quads route through the separable fast path and must
    match the true-2D engine; random quads must not factor."""
    import numpy as np
    from pdwt_tpu.filters import factor_quads, get_wavelet, quad_filters
    from pdwt_tpu.core.nonseparable import (
        _check_quads, _fwd_level, _from_nchw, _to_nchw)
    from pdwt_tpu.core import nonseparable as ns

    w = get_wavelet("db4")
    q_f = quad_filters(w.dec_lo, w.dec_hi)
    assert factor_quads(q_f) is not None
    assert factor_quads(np.stack(
        [rng.standard_normal((6, 6)) for _ in range(4)])) is None

    x = jnp.asarray(rng.standard_normal((47, 61)))
    c_fast = ns.dwt2d_ns(x, q_f, 2)
    arr, batch = _to_nchw(x, 2)
    a = arr
    for _ in range(2):
        z = _fwd_level(a, _check_quads(q_f))
        a = z[:, 0:1]
    assert float(jnp.abs(c_fast.approx - _from_nchw(a, batch, 2)).max()) < 1e-10

    # anisotropic (distinct row/col filters) still factors and matches
    w2 = get_wavelet("db2")
    lo_c = np.zeros(8); lo_c[:4] = w2.dec_lo
    hi_c = np.zeros(8); hi_c[:4] = w2.dec_hi
    q_an = np.stack([np.outer(w.dec_lo, lo_c), np.outer(w.dec_hi, lo_c),
                     np.outer(w.dec_lo, hi_c), np.outer(w.dec_hi, hi_c)])
    assert factor_quads(q_an) is not None
    c_a = ns.dwt2d_ns(x, q_an, 1)
    arr, batch = _to_nchw(x, 2)
    z = _fwd_level(arr, _check_quads(q_an))
    assert float(jnp.abs(c_a.approx - _from_nchw(z[:, 0:1], batch, 2)).max()) < 1e-10


def test_rank_decomposed_matches_true_2d_conv(rng):
    """The rank-r separable-sum path must equal the direct 2D-convolution
    formulation for genuinely non-separable (full-rank random) quads."""
    import jax.numpy as jnp
    import numpy as np

    from pdwt_tpu.core import nonseparable as ns
    from pdwt_tpu.core.separable import Coeffs2D

    q = rng.standard_normal((4, 10, 10))
    x = rng.standard_normal((64, 64)).astype(np.float32)
    arr = jnp.asarray(x)[None, None]

    # forward: rank path vs direct conv kernel
    z_rank = ns._rank_fwd_level(arr, *ns._rank_decomp(q))
    z_conv = ns._fwd_level(arr, q)
    assert float(jnp.abs(z_rank - z_conv).max()) < 1e-3

    # end-to-end: dwt2d_ns/idwt2d_ns (rank path) perfect reconstruction
    # with a wavelet-derived but artificially rank-2 quad set
    from pdwt_tpu.filters import get_wavelet, quad_filters
    w = get_wavelet("db4")
    qf = quad_filters(w.dec_lo, w.dec_hi)
    qr = qf + 0.05 * np.roll(qf, 1, axis=1)  # break joint separability
    A, B = ns._rank_decomp(qr)
    assert A.shape[1] > 1  # genuinely non-separable
    zf = ns._rank_fwd_level(arr, A, B)
    zc = ns._fwd_level(arr, qr)
    assert float(jnp.abs(zf - zc).max()) < 1e-3

    # SWT level equality
    zs_rank_c = ns.swt2d_ns(jnp.asarray(x), qr, 2)
    a2 = arr
    dets = []
    for lvl in (1, 2):
        z2 = ns._fwd_swt_level(a2, qr, 1 << (lvl - 1))
        a2 = z2[:, 0:1]
        dets.append(tuple(z2[0, k] for k in (1, 2, 3)))
    assert float(jnp.abs(zs_rank_c.approx - a2[0, 0]).max()) < 1e-3
