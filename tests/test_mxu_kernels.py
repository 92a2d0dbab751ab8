"""MXU (banded-matmul) kernel families in pallas interpret mode on CPU.

Covers the round-3 surface: SWT 2D, batched-1D (decimated + à-trous),
deep-level tile selection with tail fusion under the MXU modes, the
fused-threshold MXU denoise step, and gradients — all against the
gather oracle.  The on-chip counterparts live in test_pallas_kernels /
test_tpu_sweep.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu import ops
from pdwt_tpu.core import separable as sep
from pdwt_tpu.filters import get_wavelet


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("PDWT_PALLAS_INTERPRET", "1")


def _rel_err(tree_a, tree_b, scale):
    return max(
        float(jnp.abs(a.astype(jnp.float64) - b.astype(jnp.float64)).max())
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b))
    ) / scale


def test_mixed_swt2d_roundtrip(rng, monkeypatch):
    """SWT in mixed mode routes to the EXACT kernels (measured faster
    than b3 on undecimated levels); the b3 SWT MXU kernels themselves
    are exercised directly against the gather oracle."""
    import pdwt_tpu.kernels as kernels

    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 256, 256)), jnp.float32)
    cg = sep.swt2d(x, w, 2, backend="gather")
    cm = sep.swt2d(x, w, 2, backend="pallas")
    assert _rel_err(cm, cg, float(jnp.abs(cg.approx).max())) < 1e-6
    ym = sep.iswt2d(cm, w, backend="pallas")
    assert float(jnp.abs(ym - x).max()) < 0.05

    # direct b3 MXU level kernels vs oracle (level 2: dilated band)
    scale = float(jnp.abs(cg.approx).max())
    lvl1 = kernels.swt_fwd_level_2d_mxu(x, w.dec_lo, w.dec_hi, 1, "mixed")
    lvl2 = kernels.swt_fwd_level_2d_mxu(lvl1[0], w.dec_lo, w.dec_hi, 2,
                                        "mixed")
    assert _rel_err(lvl2, tuple(jax.tree.leaves(
        (cg.approx, cg.details[1]))), scale) < 1e-4
    y = kernels.swt_inv_level_2d_mxu(lvl2[0], *lvl2[1:], w.rec_lo,
                                     w.rec_hi, 2, "mixed")
    y = kernels.swt_inv_level_2d_mxu(y, *lvl1[1:], w.rec_lo, w.rec_hi, 1,
                                     "mixed")
    assert float(jnp.abs(y - x).max()) < 0.05


def test_bf16_swt2d_roundtrip(rng):
    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 256, 256)), jnp.float32)
    cb = sep.swt2d(x.astype(jnp.bfloat16), w, 2, backend="pallas")
    assert cb.approx.dtype == jnp.float32      # f32 A-chain
    assert cb.details[0][0].dtype == jnp.bfloat16
    yb = sep.iswt2d(cb, w, backend="pallas")
    assert yb.dtype == jnp.bfloat16
    assert float(jnp.abs(yb.astype(jnp.float32) - x).max()) < 3.0


def test_mixed_swt_denoise_fused_mxu(rng, monkeypatch):
    """Fused threshold inside the MXU synthesis == unfused oracle."""
    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    w = get_wavelet("db4")
    x = jnp.asarray(rng.standard_normal((1, 256, 256)) * 10, jnp.float32)
    cm = sep.swt2d(x, w, 2, backend="pallas")
    for mode in ("soft", "hard"):
        # threshold the SAME coefficients on both paths: the hard
        # threshold's discontinuity would otherwise flip borderline
        # coefficients between the mixed and exact forward transforms
        y_ref = sep.iswt2d((ops.soft_threshold if mode == "soft"
                            else ops.hard_threshold)(cm, 3.0), w,
                           backend="gather")
        y_fused = sep.iswt2d_denoise(cm, w, 3.0, mode=mode,
                                     backend="pallas")
        assert float(jnp.abs(y_fused - y_ref).max()) < 1e-2, mode


def test_mixed_swt_denoise_grad_mxu(rng, monkeypatch):
    """grad through the fused MXU threshold+inverse (custom VJP) matches
    the unfused gather composition (w.r.t. both image and beta)."""
    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    w = get_wavelet("db4")
    x = jnp.asarray(rng.standard_normal((1, 128, 128)) * 10, jnp.float32)

    def loss(v, b, be):
        c = sep.swt2d(v, w, 1, backend="gather")
        if be == "fused":
            y = sep.iswt2d_denoise(c, w, b, mode="soft", backend="pallas")
        else:
            y = sep.iswt2d(ops.soft_threshold(c, b), w, backend="gather")
        return jnp.sum(y ** 2)

    gx_f, gb_f = jax.grad(loss, argnums=(0, 1))(x, 3.0, "fused")
    gx_r, gb_r = jax.grad(loss, argnums=(0, 1))(x, 3.0, "ref")
    scale = float(jnp.abs(gx_r).max())
    assert float(jnp.abs(gx_f - gx_r).max()) / scale < 1e-3
    assert abs(float(gb_f) - float(gb_r)) / max(abs(float(gb_r)), 1) < 1e-3


def test_mixed_1d_families(rng, monkeypatch):
    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    w = get_wavelet("sym8")
    x = jnp.asarray(rng.uniform(-10, 10, (64, 1024)), jnp.float32)
    cg = sep.dwt1d(x, w, 2, backend="gather")
    cm = sep.dwt1d(x, w, 2, backend="pallas")
    assert _rel_err(cm, cg, float(jnp.abs(cg.approx).max())) < 1e-4
    ym = sep.idwt1d(cm, w, 1024, backend="pallas")
    assert float(jnp.abs(ym - x).max()) < 1e-2

    sg = sep.swt1d(x, w, 2, backend="gather")
    sm = sep.swt1d(x, w, 2, backend="pallas")
    assert _rel_err(sm, sg, float(jnp.abs(sg.approx).max())) < 1e-4
    ys = sep.iswt1d(sm, w, backend="pallas")
    assert float(jnp.abs(ys - x).max()) < 1e-2


def test_bf16_1d_families(rng):
    w = get_wavelet("sym8")
    x = jnp.asarray(rng.uniform(-10, 10, (64, 1024)), jnp.float32)
    xb = x.astype(jnp.bfloat16)
    cb = sep.dwt1d(xb, w, 2, backend="pallas")
    assert cb.approx.dtype == jnp.float32
    assert cb.details[0].dtype == jnp.bfloat16
    yb = sep.idwt1d(cb, w, 1024, backend="pallas")
    assert yb.dtype == jnp.bfloat16
    assert float(jnp.abs(yb.astype(jnp.float32) - x).max()) < 0.3
    sb = sep.swt1d(xb, w, 2, backend="pallas")
    ys = sep.iswt1d(sb, w, backend="pallas")
    assert float(jnp.abs(ys.astype(jnp.float32) - x).max()) < 0.3


@pytest.mark.slow
def test_mixed_deep_levels_tail_and_small_tiles(rng, monkeypatch):
    """5 levels at 512^2: levels 1-2 on (128,256)/(128,128) MXU tiles,
    level 3+ through the exact f32 fused tail — the round-2 depth gap."""
    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 512, 512)), jnp.float32)
    cg = sep.dwt2d(x, w, 5, backend="gather")
    cm = sep.dwt2d(x, w, 5, backend="pallas")
    assert _rel_err(cm, cg, float(jnp.abs(cg.approx).max())) < 1e-4
    ym = sep.idwt2d(cm, w, (512, 512), backend="pallas")
    assert float(jnp.abs(ym - x).max()) < 0.1


def test_bf16_deep_levels(rng):
    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 512, 512)), jnp.float32)
    cb = sep.dwt2d(x.astype(jnp.bfloat16), w, 5, backend="pallas")
    assert cb.approx.dtype == jnp.float32
    assert all(t.dtype == jnp.bfloat16
               for lev in cb.details for t in lev)
    yb = sep.idwt2d(cb, w, (512, 512), backend="pallas")
    assert yb.dtype == jnp.bfloat16
    # the round-3 accuracy target: <= ~3 absolute on [0,255] data at
    # depth (round 2 was 16.0 with the all-bf16 chain)
    assert float(jnp.abs(yb.astype(jnp.float32) - x).max()) < 3.5


def test_swt_mxu_inkernel_halo_equality(rng, monkeypatch):
    """Opt-in in-kernel periodic halo (region DMAs from the unpadded
    array) must reproduce the XLA-pad path bit-for-bit."""
    import pdwt_tpu.kernels as kernels

    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 256, 256)), jnp.bfloat16)
    subs = tuple(jnp.asarray(rng.uniform(-1, 1, (1, 256, 256)), dt)
                 for dt in (jnp.float32, jnp.bfloat16, jnp.bfloat16,
                            jnp.bfloat16))
    ref_f = kernels.swt_fwd_level_2d_mxu(x, w.dec_lo, w.dec_hi, 2, "bf16")
    ref_i = kernels.swt_inv_level_2d_mxu(*subs, w.rec_lo, w.rec_hi, 2,
                                         "bf16")
    monkeypatch.setenv("PDWT_TPU_INKERNEL_HALO", "1")
    halo_f = kernels.swt_fwd_level_2d_mxu(x, w.dec_lo, w.dec_hi, 2, "bf16")
    halo_i = kernels.swt_inv_level_2d_mxu(*subs, w.rec_lo, w.rec_hi, 2,
                                          "bf16")
    for a, b in zip(ref_f, halo_f):
        assert jnp.array_equal(a.astype(jnp.float32),
                               b.astype(jnp.float32))
    assert jnp.array_equal(ref_i.astype(jnp.float32),
                           halo_i.astype(jnp.float32))


def test_bf16_swt_denoise_fused_mxu_and_grad():
    """The MXU fused threshold+inverse (and its hand-written VJP) IS the
    bf16-mode denoise path — exercise primal equality vs the unfused
    composition and the gradient (image + beta) through the custom VJP.
    Local fixed rng: the bound on the FD beta check is sample-sensitive
    and must not depend on test order."""
    w = get_wavelet("db4")
    rng = np.random.default_rng(20240817)
    x = jnp.asarray(rng.standard_normal((1, 128, 128)) * 10, jnp.float32)
    xb = x.astype(jnp.bfloat16)
    cb = sep.swt2d(xb, w, 2, backend="pallas")

    for mode in ("soft", "hard"):
        y_fused = sep.iswt2d_denoise(cb, w, 3.0, mode=mode,
                                     backend="pallas")
        assert y_fused.dtype == jnp.bfloat16
        thr = ops.soft_threshold if mode == "soft" else ops.hard_threshold
        y_ref = sep.iswt2d(thr(cb, 3.0), w, backend="pallas")
        # same coefficients, same per-level kernels -> tight agreement
        err = float(jnp.abs(y_fused.astype(jnp.float32)
                            - y_ref.astype(jnp.float32)).max())
        assert err < 0.5, (mode, err)

    def loss(v, b, fused):
        c = sep.swt2d(v, w, 1, backend="gather")
        cbm = type(c)(c.approx,
                      tuple(tuple(t.astype(jnp.bfloat16) for t in lev)
                            for lev in c.details))
        if fused:
            y = sep.iswt2d_denoise(cbm, w, b, mode="soft",
                                   backend="pallas")
        else:
            y = sep.iswt2d(ops.soft_threshold(cbm, b), w,
                           backend="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gx_f, gb_f = jax.grad(loss, argnums=(0, 1))(x, 3.0, True)
    assert bool(jnp.all(jnp.isfinite(gx_f)))
    gx_r = jax.grad(loss, argnums=0)(x, 3.0, False)
    scale = float(jnp.abs(gx_r).max())
    assert float(jnp.abs(gx_f - gx_r).max()) / scale < 3e-2
    # beta gradient vs finite differences OF THE FUSED LOSS (the unfused
    # path thresholds in bf16 arithmetic — a quantizer whose autodiff/FD
    # both differ; the fused kernel thresholds in f32)
    eps = 1e-2
    fd = (loss(x, 3.0 + eps, True) - loss(x, 3.0 - eps, True)) / (2 * eps)
    assert abs(float(gb_f) - float(fd)) / abs(float(fd)) < 3e-2


def test_bf16_tail_covers_all_levels_dtype(rng):
    """384^2 db4 level-1: no MXU lane tile divides 192, the exact tail
    kernel covers the WHOLE inverse — the bf16 output contract must
    still hold (round-3 review finding: returned f32)."""
    w = get_wavelet("db4")
    x = jnp.asarray(rng.uniform(0, 255, (1, 384, 384)),
                    jnp.float32).astype(jnp.bfloat16)
    c = sep.dwt2d(x, w, 1, backend="pallas")
    assert c.approx.dtype == jnp.float32
    y = sep.idwt2d(c, w, (384, 384), backend="pallas")
    assert y.dtype == jnp.bfloat16
    assert float(jnp.abs(y.astype(jnp.float32)
                         - x.astype(jnp.float32)).max()) < 3.0


def test_bf16_odd_sizes_fallback(rng):
    """Odd/indivisible sizes in bf16 mode route through the virtual
    extension + fma fallback while keeping the dtype contract."""
    w = get_wavelet("db3")
    x = jnp.asarray(rng.uniform(0, 255, (1, 95, 187)),
                    jnp.float32).astype(jnp.bfloat16)
    c = sep.dwt2d(x, w, 2, backend="pallas")
    assert c.approx.dtype == jnp.float32
    assert c.details[0][0].dtype == jnp.bfloat16
    y = sep.idwt2d(c, w, (95, 187), backend="pallas")
    assert y.dtype == jnp.bfloat16
    assert float(jnp.abs(y.astype(jnp.float32)
                         - x.astype(jnp.float32)).max()) < 3.0


def test_bf16_grad_through_mxu(rng):
    """jax.grad through the bf16 MXU roundtrip (custom VJPs with mixed
    per-subband dtypes) runs and approximates the exact-path gradient."""
    w = get_wavelet("db4")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256)), jnp.float32)

    def loss(v, bf16):
        u = v.astype(jnp.bfloat16) if bf16 else v
        c = sep.dwt2d(u, w, 1, backend="pallas")
        y = sep.idwt2d(c, w, (256, 256), backend="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gb = jax.grad(lambda v: loss(v, True))(x)
    gf = jax.grad(lambda v: loss(v, False))(x)
    assert bool(jnp.all(jnp.isfinite(gb)))
    scale = float(jnp.abs(gf).max())
    assert float(jnp.abs(gb - gf).max()) / scale < 0.1  # bf16-class agreement


def test_rank_r_nonseparable_mxu(rng, monkeypatch):
    """Genuinely-2D (rank-3) quads through the rank-decomposed MXU
    kernels: mixed matches the exact rank path; bf16 keeps the dtype
    contract (round-3: the one engine that had no fused-kernel path)."""
    from pdwt_tpu.core import nonseparable as ns

    q = np.zeros((4, 8, 8))
    g = np.random.default_rng(7)
    for _ in range(3):
        q += np.einsum("si,j->sij", g.standard_normal((4, 8)),
                       g.standard_normal(8))
    q /= np.abs(q).sum(axis=(1, 2), keepdims=True)
    x = jnp.asarray(rng.uniform(0, 255, (256, 256)), jnp.float32)

    c_ref = ns.dwt2d_ns(x, q, 2)
    y_ref = ns.idwt2d_ns(c_ref, q, (256, 256))

    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    c_m = ns.dwt2d_ns(x, q, 2, backend="pallas")
    scale = float(jnp.abs(c_ref.approx).max())
    assert _rel_err(c_m, c_ref, scale) < 1e-4
    y_m = ns.idwt2d_ns(c_m, q, (256, 256), backend="pallas")
    assert (float(jnp.abs(y_m - y_ref).max())
            / float(jnp.abs(y_ref).max())) < 1e-4
    monkeypatch.delenv("PDWT_TPU_PRECISION")

    cb = ns.dwt2d_ns(x.astype(jnp.bfloat16), q, 2, backend="pallas")
    assert cb.approx.dtype == jnp.float32
    assert cb.details[0][0].dtype == jnp.bfloat16
    yb = ns.idwt2d_ns(cb, q, (256, 256), backend="pallas")
    assert yb.dtype == jnp.bfloat16
    assert (float(jnp.abs(yb.astype(jnp.float32) - y_ref).max())
            / float(jnp.abs(y_ref).max())) < 2e-2


def test_rank_r_nonseparable_swt_mxu(rng, monkeypatch):
    """À-trous rank-r quads through the MXU (dilated rank-block bands)."""
    from pdwt_tpu.core import nonseparable as ns

    q = np.zeros((4, 8, 8))
    g = np.random.default_rng(7)
    for _ in range(3):
        q += np.einsum("si,j->sij", g.standard_normal((4, 8)),
                       g.standard_normal(8))
    q /= np.abs(q).sum(axis=(1, 2), keepdims=True)
    x = jnp.asarray(rng.uniform(0, 255, (256, 256)), jnp.float32)

    c_ref = ns.swt2d_ns(x, q, 2)
    y_ref = ns.iswt2d_ns(c_ref, q)

    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    c_m = ns.swt2d_ns(x, q, 2, backend="pallas")
    assert _rel_err(c_m, c_ref, float(jnp.abs(c_ref.approx).max())) < 1e-4
    y_m = ns.iswt2d_ns(c_m, q, backend="pallas")
    assert (float(jnp.abs(y_m - y_ref).max())
            / float(jnp.abs(y_ref).max())) < 1e-4
    monkeypatch.delenv("PDWT_TPU_PRECISION")

    cb = ns.swt2d_ns(x.astype(jnp.bfloat16), q, 2, backend="pallas")
    assert cb.approx.dtype == jnp.float32
    assert cb.details[0][0].dtype == jnp.bfloat16
    yb = ns.iswt2d_ns(cb, q, backend="pallas")
    assert yb.dtype == jnp.bfloat16
    assert (float(jnp.abs(yb.astype(jnp.float32) - y_ref).max())
            / float(jnp.abs(y_ref).max())) < 2e-2


def test_ns_mxu_gated_off_non_pallas(rng, monkeypatch):
    """NS MXU kernels must not fire outside the pallas backend: bf16
    rank quads on the CPU default backend (no interpret) run the conv
    rank path instead of crashing; PDWT_TPU_BACKEND=fma is honored."""
    from pdwt_tpu.core import nonseparable as ns

    monkeypatch.delenv("PDWT_PALLAS_INTERPRET", raising=False)
    q = np.zeros((4, 6, 6))
    g = np.random.default_rng(5)
    for _ in range(2):
        q += np.einsum("si,j->sij", g.standard_normal((4, 6)),
                       g.standard_normal(6))
    x = jnp.asarray(rng.uniform(0, 255, (128, 128)),
                    jnp.float32).astype(jnp.bfloat16)
    c = ns.dwt2d_ns(x, q, 1)        # would crash if MXU fired on CPU
    y = ns.idwt2d_ns(c, q, (128, 128))
    assert y.shape == (128, 128)
    monkeypatch.setenv("PDWT_TPU_BACKEND", "fma")
    import pdwt_tpu.core.conv as conv_mod
    conv_mod.set_default_backend("fma")
    try:
        c = ns.swt2d_ns(x, q, 1)
        assert c.approx.shape == (128, 128)
    finally:
        conv_mod.set_default_backend(None)


@pytest.mark.slow
def test_ns_mxu_grad(rng, monkeypatch):
    """jax.grad through the NS MXU custom VJPs (decimated + à-trous)
    matches the exact rank path."""
    from pdwt_tpu.core import nonseparable as ns

    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    q = np.zeros((4, 6, 6))
    g = np.random.default_rng(5)
    for _ in range(2):
        q += np.einsum("si,j->sij", g.standard_normal((4, 6)),
                       g.standard_normal(6))
    q /= np.abs(q).sum(axis=(1, 2), keepdims=True)
    x = jnp.asarray(rng.uniform(-1, 1, (256, 256)), jnp.float32)

    def loss(v, be):
        c = ns.dwt2d_ns(v, q, 1, backend=be)
        y = ns.idwt2d_ns(c, q, (256, 256), backend=be)
        return jnp.sum(y ** 2)

    gm = jax.grad(lambda v: loss(v, "pallas"))(x)
    ge = jax.grad(lambda v: loss(v, None))(x)
    scale = float(jnp.abs(ge).max())
    assert bool(jnp.all(jnp.isfinite(gm)))
    assert float(jnp.abs(gm - ge).max()) / scale < 1e-3

    # bf16 à-trous grad runs through the swt NS VJPs
    def loss_swt(v):
        u = v.astype(jnp.bfloat16)
        c = ns.swt2d_ns(u, q, 1, backend="pallas")
        y = ns.iswt2d_ns(c, q, backend="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gb = jax.grad(loss_swt)(x)
    assert bool(jnp.all(jnp.isfinite(gb)))


def test_b2_schemes_fwd_interpret(rng, monkeypatch):
    """Forward-level scheme ladder on bf16 input.  Error sources per
    scheme: b1 = filter bf16 rounding + pass-2 intermediate rounding;
    b2f = intermediate only (filter ships as exact hi+lo splits);
    b2d = filter only (the data side splits in-kernel — the bf16 input
    is exact, the f32 pass-2 intermediate gets corrected); b3 = both
    corrected (~2^-17).  CPU ladder: 5.4e-3 / 2.5e-3 / 3.3e-3 /
    1.1e-5."""
    import pdwt_tpu.kernels as kernels

    w = get_wavelet("db7")
    xb = jnp.asarray(rng.uniform(0, 255, (1, 256, 256)),
                     jnp.float32).astype(jnp.bfloat16)
    xf = xb.astype(jnp.float32)
    cg = sep.dwt2d(xf, w, 1, backend="gather")
    scale = float(jnp.abs(cg.approx).max())

    # the detail bands are STORED bf16 (2^-9 storage rounding masks any
    # compute improvement) — the f32-stored approx band shows the
    # compute precision directly
    errs = {}
    for scheme in ("b1", "b2f", "b2d", "b3"):
        monkeypatch.setenv("PDWT_TPU_BF16_L1FWD", scheme)
        res = kernels.fwd_level_2d_mxu(xb, w.dec_lo, w.dec_hi, "bf16")
        assert res is not None
        errs[scheme] = _rel_err((res[0],), (cg.approx,), scale)
    assert errs["b3"] < 3e-5
    assert errs["b2f"] < errs["b1"] / 1.8
    assert errs["b2d"] < errs["b1"] / 1.2
    assert errs["b3"] < errs["b2f"] / 50


def test_b2_schemes_inv_interpret(rng, monkeypatch):
    """Final-inverse-level schemes under bf16 mode all reconstruct
    against the gather synthesis of the same inputs.  On CPU ``fd``
    (f32 operands, DEFAULT precision) is already exact, so the four
    schemes coincide at the bf16-detail storage floor — the ladder only
    separates on the TPU, where DEFAULT-f32 is a single bf16 pass
    (tools/b2_sweep.py measures it there)."""
    import pdwt_tpu.kernels as kernels
    from pdwt_tpu.core.separable import Coeffs2D

    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 256, 256)), jnp.float32)
    c = sep.dwt2d(x, w, 1, backend="gather")
    a = c.approx
    h, v, d = (t.astype(jnp.bfloat16) for t in c.details[0])
    # oracle: exact synthesis of the SAME (f32 a, bf16 details) inputs
    cb = Coeffs2D(a, ((h.astype(jnp.float32), v.astype(jnp.float32),
                       d.astype(jnp.float32)),))
    y_ref = sep.idwt2d(cb, w, (256, 256), backend="gather")
    scale = float(jnp.abs(y_ref).max())

    errs = {}
    for scheme in ("fd", "b2f", "b2d", "b3"):
        monkeypatch.setenv("PDWT_TPU_BF16_L1INV", scheme)
        y = kernels.inv_level_2d_mxu(a, h, v, d, w.rec_lo, w.rec_hi,
                                     "bf16", out_dtype=jnp.float32)
        assert y is not None
        errs[scheme] = float(jnp.abs(y - y_ref).max()) / scale
    # all schemes sit at/near the bf16-detail storage floor on CPU;
    # none may degrade reconstruction beyond it
    for scheme, e in errs.items():
        assert e < 1e-4, (scheme, e)


def test_bf16_accuracy_tiers(rng, monkeypatch):
    """PDWT_TPU_BF16_ACCURACY maps to the measured (fwd, inv) scheme
    pairs; bad values raise; the balanced tier runs end-to-end in
    interpret mode with the bf16 dtype contract intact."""
    from pdwt_tpu.kernels.matmul_pallas import _bf16_l1_schemes

    assert _bf16_l1_schemes() == ("b1", "fd")
    monkeypatch.setenv("PDWT_TPU_BF16_ACCURACY", "balanced")
    assert _bf16_l1_schemes() == ("b2f", "b2f")
    monkeypatch.setenv("PDWT_TPU_BF16_L1INV", "b3")
    assert _bf16_l1_schemes() == ("b2f", "b3")  # raw knob overrides
    monkeypatch.delenv("PDWT_TPU_BF16_L1INV")
    monkeypatch.setenv("PDWT_TPU_BF16_ACCURACY", "typo")
    with pytest.raises(ValueError):
        _bf16_l1_schemes()

    monkeypatch.setenv("PDWT_TPU_BF16_ACCURACY", "balanced")
    w = get_wavelet("db4")
    x = jnp.asarray(rng.uniform(0, 255, (1, 256, 256)),
                    jnp.float32).astype(jnp.bfloat16)
    c = sep.dwt2d(x, w, 2, backend="pallas")
    assert c.approx.dtype == jnp.float32
    assert c.details[0][0].dtype == jnp.bfloat16
    y = sep.idwt2d(c, w, (256, 256), backend="pallas")
    assert y.dtype == jnp.bfloat16
    err = float(jnp.abs(y.astype(jnp.float32)
                        - x.astype(jnp.float32)).max())
    assert err < 3.0


def test_swt_bf16_scheme_override(rng, monkeypatch):
    """PDWT_TPU_SWT_BF16_SCHEME routes the à-trous bf16 kernels through
    a pair scheme end-to-end (interpret mode), keeping the dtype
    contract and reconstruction."""
    monkeypatch.setenv("PDWT_TPU_SWT_BF16_SCHEME", "b2f")
    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 256, 256)), jnp.float32)
    cb = sep.swt2d(x.astype(jnp.bfloat16), w, 2, backend="pallas")
    assert cb.approx.dtype == jnp.float32
    assert cb.details[0][0].dtype == jnp.bfloat16
    yb = sep.iswt2d(cb, w, backend="pallas")
    assert yb.dtype == jnp.bfloat16
    assert float(jnp.abs(yb.astype(jnp.float32) - x).max()) < 3.0
