"""Pallas fused level kernels vs the gather oracle (real TPU only).

Round-3 rework: every family's wavelet sweep runs inside ONE jitted
program (both the pallas path and the gather oracle), so hardware
regressions are checkable in a few remote compiles instead of one per
test (the tunnel makes each compile cost ~10-60 s; see
test_tpu_sweep.py for the pattern).  The CPU suite covers identical
semantics via interpret mode and the fma/xla backends.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as sep
from pdwt_tpu.filters import get_wavelet

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels need a TPU")


def _tree_max_err(a, b):
    return jnp.max(jnp.stack([
        jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    ]))


def _family_errs(wnames, fwd, inv, x):
    """One compile: per wavelet, (max coeff diff pallas-vs-gather,
    recon error) on-device."""

    @jax.jit
    def run(img):
        cerrs, rerrs = [], []
        for wname in wnames:
            w = get_wavelet(wname)
            cp = fwd(img, w, "pallas")
            cg = fwd(img, w, "gather")
            cerrs.append(_tree_max_err(cp, cg))
            y = inv(cp, w, img, "pallas")
            rerrs.append(jnp.max(jnp.abs(y.astype(jnp.float32)
                                         - img.astype(jnp.float32))))
        return jnp.stack(cerrs), jnp.stack(rerrs)

    c, r = run(x)
    return np.asarray(c), np.asarray(r)


WAVES = ["haar", "db7", "db20", "bior4.4"]


def test_pallas_2d_dwt_family(rng):
    x = jnp.asarray(rng.standard_normal((2, 256, 256)), dtype=jnp.float32)
    c, r = _family_errs(
        WAVES,
        lambda img, w, be: sep.dwt2d(img, w, 2, backend=be),
        lambda cp, w, img, be: sep.idwt2d(cp, w, img.shape[-2:],
                                          backend=be), x)
    for wname, ce, re in zip(WAVES, c, r):
        assert ce < 1e-4 and re < 1e-4, (wname, float(ce), float(re))


def test_pallas_2d_swt_family(rng):
    x = jnp.asarray(rng.standard_normal((1, 256, 256)), dtype=jnp.float32)
    c, r = _family_errs(
        ["db7", "bior4.4"],
        lambda img, w, be: sep.swt2d(img, w, 3, backend=be),
        lambda cp, w, img, be: sep.iswt2d(cp, w, backend=be), x)
    for wname, ce, re in zip(["db7", "bior4.4"], c, r):
        assert ce < 1e-4 and re < 1e-4, (wname, float(ce), float(re))


def test_pallas_1d_families(rng):
    x = jnp.asarray(rng.standard_normal((64, 2048)), dtype=jnp.float32)
    c, r = _family_errs(
        ["sym8"],
        lambda img, w, be: sep.dwt1d(img, w, 3, backend=be),
        lambda cp, w, img, be: sep.idwt1d(cp, w, img.shape[-1],
                                          backend=be), x)
    assert c[0] < 1e-4 and r[0] < 1e-4
    c, r = _family_errs(
        ["sym8"],
        lambda img, w, be: sep.swt1d(img, w, 3, backend=be),
        lambda cp, w, img, be: sep.iswt1d(cp, w, backend=be), x)
    assert c[0] < 1e-4 and r[0] < 1e-4


def test_pallas_fallback_and_odd_geometries(rng):
    """Odd sizes + virtual extension route through the fma fallback
    inside the pallas path — one compile for all shapes' checks."""
    w3, w7 = get_wavelet("db3"), get_wavelet("db7")

    @jax.jit
    def run(x94, x511):
        e1 = _tree_max_err(sep.dwt2d(x94, w3, 2, backend="pallas"),
                           sep.dwt2d(x94, w3, 2, backend="gather"))
        y1 = sep.idwt2d(sep.dwt2d(x94, w3, 2, backend="pallas"), w3,
                        (94, 190), backend="pallas")
        e2 = _tree_max_err(sep.dwt2d(x511, w7, 2, backend="pallas"),
                           sep.dwt2d(x511, w7, 2, backend="gather"))
        y2 = sep.idwt2d(sep.dwt2d(x511, w7, 2, backend="pallas"), w7,
                        (511, 1023), backend="pallas")
        return (e1, jnp.max(jnp.abs(y1 - x94)),
                e2, jnp.max(jnp.abs(y2 - x511)))

    x94 = jnp.asarray(rng.standard_normal((1, 94, 190)), jnp.float32)
    x511 = jnp.asarray(rng.standard_normal((1, 511, 1023)), jnp.float32)
    errs = [float(v) for v in run(x94, x511)]
    assert max(errs) < 1e-4, errs


def test_pallas_haar_api_dispatch(rng):
    """On TPU the API routes haar through the pallas separable path;
    values must equal the dedicated butterfly core."""
    from pdwt_tpu.core import haar as haar_core
    x = jnp.asarray(rng.standard_normal((128, 128)), dtype=jnp.float32)

    @jax.jit
    def run(img):
        c1 = haar_core.haar_dwt2d(img, 2)
        c2 = sep.dwt2d(img, get_wavelet("haar"), 2, backend="pallas")
        return _tree_max_err(c1, c2)

    assert float(run(x)) < 1e-5


def test_pallas_grad_matches_fma(rng):
    """Custom VJPs: jax.grad through the pallas path equals autodiff
    through the (natively differentiable) fma path — DWT and SWT in one
    compile each direction."""
    w = get_wavelet("db7")
    x = jnp.asarray(rng.standard_normal((128, 256)), dtype=jnp.float32)

    def loss(v, be):
        c = sep.dwt2d(v, w, 2, backend=be)
        y = sep.idwt2d(c, w, (128, 256), backend=be)
        return jnp.sum((y - 0.5 * v) ** 2)

    def loss_swt(v, be):
        c = sep.swt2d(v, w, 2, backend=be)
        return jnp.sum(sep.iswt2d(c, w, backend=be) * v)

    @jax.jit
    def run(v):
        gp = jax.grad(lambda u: loss(u, "pallas"))(v)
        gf = jax.grad(lambda u: loss(u, "fma"))(v)
        gps = jax.grad(lambda u: loss_swt(u, "pallas"))(v)
        gfs = jax.grad(lambda u: loss_swt(u, "fma"))(v)
        return jnp.max(jnp.abs(gp - gf)), jnp.max(jnp.abs(gps - gfs))

    e1, e2 = run(x)
    assert float(e1) < 1e-4 and float(e2) < 1e-4


def test_tail_fusion_matches_gather(rng):
    """Trailing-level fused kernel (all levels in one VMEM-resident
    invocation for small images) vs the gather oracle."""
    w = get_wavelet("db7")
    x = jnp.asarray(rng.standard_normal((1, 256, 256)), dtype=jnp.float32)

    @jax.jit
    def run(img):
        cp = sep.dwt2d(img, w, 4, backend="pallas")   # fully fused
        cg = sep.dwt2d(img, w, 4, backend="gather")
        y = sep.idwt2d(cp, w, (256, 256), backend="pallas")
        return _tree_max_err(cp, cg), jnp.max(jnp.abs(y - img))

    e1, e2 = run(x)
    assert float(e1) < 1e-4 and float(e2) < 1e-4


def test_mxu_modes_on_chip(rng, monkeypatch):
    """bf16 + mixed MXU banded-matmul paths on real hardware — 2D DWT,
    SWT, batched-1D in ONE compile per mode."""
    w = get_wavelet("db7")
    w8 = get_wavelet("sym8")
    x2 = jnp.asarray(rng.uniform(0, 255, (1, 1024, 1024)), jnp.float32)
    x1 = jnp.asarray(rng.uniform(-10, 10, (64, 2048)), jnp.float32)

    @jax.jit
    def run_bf16(img, sig):
        ib, sb = img.astype(jnp.bfloat16), sig.astype(jnp.bfloat16)
        cb = sep.dwt2d(ib, w, 3, backend="pallas")
        y = sep.idwt2d(cb, w, (1024, 1024), backend="pallas")
        e_dwt = jnp.max(jnp.abs(y.astype(jnp.float32) - img))
        cs = sep.swt2d(ib, w, 2, backend="pallas")
        ys = sep.iswt2d(cs, w, backend="pallas")
        e_swt = jnp.max(jnp.abs(ys.astype(jnp.float32) - img))
        c1 = sep.dwt1d(sb, w8, 3, backend="pallas")
        y1 = sep.idwt1d(c1, w8, 2048, backend="pallas")
        e_1d = jnp.max(jnp.abs(y1.astype(jnp.float32) - sig))
        return e_dwt, e_swt, e_1d

    e_dwt, e_swt, e_1d = (float(v) for v in run_bf16(x2, x1))
    assert e_dwt < 5.0, e_dwt        # bf16 contract (worst-case noise)
    assert e_swt < 8.0, e_swt
    assert e_1d < 0.3, e_1d

    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")

    @jax.jit
    def run_mixed(img, sig):
        cm = sep.dwt2d(img, w, 3, backend="pallas")
        cg = sep.dwt2d(img, w, 3, backend="gather")
        e_coef = _tree_max_err(cm, cg) / jnp.max(jnp.abs(cg.approx))
        y = sep.idwt2d(cm, w, (1024, 1024), backend="pallas")
        e_rec = jnp.max(jnp.abs(y - img))
        c1 = sep.dwt1d(sig, w8, 3, backend="pallas")
        y1 = sep.idwt1d(c1, w8, 2048, backend="pallas")
        e_1d = jnp.max(jnp.abs(y1 - sig))
        return e_coef, e_rec, e_1d

    e_coef, e_rec, e_1d = (float(v) for v in run_mixed(x2, x1))
    assert e_coef < 1e-4, e_coef     # mixed contract: ~1e-5..1e-4 rel
    assert e_rec < 0.1, e_rec
    assert e_1d < 1e-2, e_1d
