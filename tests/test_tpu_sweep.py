"""Wide real-chip sweep (PDWT_TEST_TPU=1): representative wavelets across
every transform family, odd/fallback geometries, and an all-72 smoke
sweep (PDWT_TPU_SWEEP=1 — each wavelet's kernels live in ONE jitted
program so the whole bank costs a single remote compile).

Round-1 verdict item 7: the tile-selection logic has many branches that
only real-chip runs exercise.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as sep
from pdwt_tpu.filters import get_wavelet, list_wavelets

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU sweep needs the real chip")

# 10 representative wavelets: extremes of hlen, orthogonal + biorthogonal
# + reverse-biorthogonal families, odd-hlen fallback candidates.
WAVES10 = ["haar", "db2", "db7", "db20", "sym8", "coif3", "bior2.6",
           "bior4.4", "rbio3.5", "sym16"]


def _roundtrip_errs(wnames, make_fwd, make_inv, x):
    """One jitted program computing fwd+inv recon error for EVERY
    wavelet — one remote compile for the whole list."""

    @jax.jit
    def run(img):
        errs = []
        for wname in wnames:
            w = get_wavelet(wname)
            c = make_fwd(img, w)
            y = make_inv(c, w, img)
            errs.append(jnp.max(jnp.abs(y - img)))
        return jnp.stack(errs)

    return np.asarray(run(x))


def test_ten_wavelets_2d_dwt(rng):
    x = jnp.asarray(rng.uniform(0, 255, (256, 256)), jnp.float32)
    errs = _roundtrip_errs(
        WAVES10,
        lambda img, w: sep.dwt2d(img, w, 2),
        lambda c, w, img: sep.idwt2d(c, w, img.shape), x)
    for wname, e in zip(WAVES10, errs):
        assert e < 1e-2, (wname, float(e))


def test_ten_wavelets_2d_swt(rng):
    x = jnp.asarray(rng.uniform(0, 255, (256, 256)), jnp.float32)
    errs = _roundtrip_errs(
        WAVES10,
        lambda img, w: sep.swt2d(img, w, 2),
        lambda c, w, img: sep.iswt2d(c, w), x)
    for wname, e in zip(WAVES10, errs):
        assert e < 1e-2, (wname, float(e))


def test_ten_wavelets_1d(rng):
    x = jnp.asarray(rng.uniform(0, 255, (16, 1024)), jnp.float32)
    errs = _roundtrip_errs(
        WAVES10,
        lambda img, w: sep.dwt1d(img, w, 2),
        lambda c, w, img: sep.idwt1d(c, w, img.shape[-1]), x)
    for wname, e in zip(WAVES10, errs):
        assert e < 1e-2, (wname, float(e))


def test_odd_and_fallback_geometries(rng):
    """Odd sizes, non-tile-divisible sizes, deep SWT (dilated halo >
    tile) — the per-level fma fallbacks inside the pallas path."""
    w = get_wavelet("db7")

    @jax.jit
    def run(img):
        c = sep.dwt2d(img, w, 3)
        return jnp.max(jnp.abs(sep.idwt2d(c, w, img.shape) - img))

    for shape in ((94, 190), (250, 122), (257, 255)):
        x = jnp.asarray(rng.uniform(0, 255, shape), jnp.float32)
        assert float(run(x)) < 1e-2, shape

    # deep SWT: level-5 dilation 16 -> span 208 with db7
    x = jnp.asarray(rng.uniform(0, 255, (512, 512)), jnp.float32)

    @jax.jit
    def run_swt(img):
        c = sep.swt2d(img, w, 5)
        return jnp.max(jnp.abs(sep.iswt2d(c, w) - img))

    assert float(run_swt(x)) < 1e-2


@pytest.mark.skipif(os.environ.get("PDWT_TPU_SWEEP") != "1",
                    reason="all-72 sweep is slow; set PDWT_TPU_SWEEP=1")
def test_all_72_wavelets_smoke(rng):
    """Single-level fwd+inv on the FULL bank, one compile."""
    names = list_wavelets()
    assert len(names) >= 72
    x = jnp.asarray(rng.uniform(0, 255, (128, 128)), jnp.float32)
    errs = _roundtrip_errs(
        names,
        lambda img, w: sep.dwt2d(img, w, 1),
        lambda c, w, img: sep.idwt2d(c, w, img.shape), x)
    bad = [(n, float(e)) for n, e in zip(names, errs) if not e < 5e-2]
    assert not bad, bad


def test_3d_roundtrips_on_chip(rng):
    """3D composition on real Mosaic (fused 2D level kernel with depth
    as batch + fma depth pass): DWT + SWT roundtrips for three wavelets
    in ONE jitted program each, plus the bf16 serving mode (kept small —
    large remote compiles hang in degraded tunnel phases)."""
    from pdwt_tpu.core import separable3d as sep3

    waves = ["haar", "db4", "sym8"]
    x = jnp.asarray(rng.uniform(0, 255, (8, 128, 256)), jnp.float32)
    errs = _roundtrip_errs(
        waves,
        lambda img, w: sep3.dwt3d(img, w, 2),
        lambda c, w, img: sep3.idwt3d(c, w, img.shape), x)
    for wname, e in zip(waves, errs):
        assert e < 1e-2, (wname, float(e))
    errs = _roundtrip_errs(
        waves,
        lambda img, w: sep3.swt3d(img, w, 2),
        lambda c, w, img: sep3.iswt3d(c, w), x)
    for wname, e in zip(waves, errs):
        assert e < 1e-2, (wname, float(e))

    # bf16 serving mode: f32 A-chain + bf16 details on the MXU kernels
    w4 = get_wavelet("db4")
    xb = x.astype(jnp.bfloat16)

    @jax.jit
    def bf16_rt(img):
        c = sep3.dwt3d(img, w4, 2)
        y = sep3.idwt3d(c, w4, img.shape)
        return jnp.max(jnp.abs(y.astype(jnp.float32)
                               - img.astype(jnp.float32)))

    assert float(bf16_rt(xb)) < 8.0


def test_fourth_session_features_on_chip(rng):
    """One compile (+ one bf16): fused-denoise modes (soft/hard/garrote)
    vs unfused, packets roundtrip, anisotropic roundtrip, fused 3D SWT
    denoise — the fourth-session surface validated on real hardware."""
    from pdwt_tpu import ops
    from pdwt_tpu.core import anisotropic as A
    from pdwt_tpu.core import packets as P
    from pdwt_tpu.core import separable3d as S3

    w = get_wavelet("db4")
    x = jnp.asarray(rng.uniform(0, 255, (512, 512)), jnp.float32)
    vol = jnp.asarray(rng.uniform(0, 255, (8, 128, 256)), jnp.float32)
    thr = {"soft": ops.soft_threshold, "hard": ops.hard_threshold,
           "garrote": ops.garrote_threshold}

    @jax.jit
    def run(img, v):
        errs = []
        c = sep.swt2d(img, w, 2)
        for mode in ("soft", "hard", "garrote"):
            y_f = sep.iswt2d_denoise(c, w, 10.0, mode=mode)
            y_r = sep.iswt2d(thr[mode](c, 10.0), w)
            errs.append(jnp.max(jnp.abs(y_f - y_r)))
        pk = P.wp2d(img, w, 2)
        errs.append(jnp.max(jnp.abs(
            P.iwp2d(pk.nodes[2], w, img.shape) - img)))
        y2 = A.fs_idwt(A.fs_dwt(img, w, (2, 3)), w, img.shape, (2, 3))
        errs.append(jnp.max(jnp.abs(y2 - img)))
        c3 = S3.swt3d(v, w, 1)
        y3f = S3.iswt3d_denoise(c3, w, 10.0)
        y3r = S3.iswt3d(ops.soft_threshold(c3, 10.0), w)
        errs.append(jnp.max(jnp.abs(y3f - y3r)))
        return jnp.stack(errs)

    errs = np.asarray(run(x, vol))
    assert (errs < 2e-2).all(), errs  # f32 roundoff on [0,255] data

    # bf16 serving mode through the same fused paths (one more compile)
    @jax.jit
    def run_b(img):
        c = sep.swt2d(img, w, 2)
        y_f = sep.iswt2d_denoise(c, w, 10.0, mode="garrote")
        y_r = sep.iswt2d(ops.garrote_threshold(c, 10.0), w)
        return jnp.max(jnp.abs(y_f.astype(jnp.float32)
                               - y_r.astype(jnp.float32)))
    errb = float(run_b(x.astype(jnp.bfloat16)))
    assert errb < 8.0, errb  # bf16 storage rounding on [0,255]


def test_round5_modes_and_tiers_on_chip(rng):
    """Round-5 features on the real chip: (a) pywt boundary modes ride
    the fma formulation and reconstruct; (b) the precision= kwarg
    selects distinct compiled tiers from one process."""
    img = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    w = get_wavelet("db4")

    @jax.jit
    def rt_modes(x):
        outs = []
        for mode in ("symmetric", "reflect", "zero"):
            c = sep.dwt2d(x, w, 3, mode=mode)
            outs.append(jnp.max(jnp.abs(
                sep.idwt2d(c, w, (256, 256), mode=mode) - x)))
        return jnp.stack(outs)

    errs = np.asarray(rt_modes(img))
    assert (errs < 1e-4).all(), errs

    xb = img.astype(jnp.bfloat16)

    def rt(p):
        return jax.jit(lambda a: sep.idwt2d(
            sep.dwt2d(a, w, 3, precision=p), w, (256, 256), precision=p))

    y_fast = np.asarray(rt("bf16-fast")(xb), np.float32)
    y_bal = np.asarray(rt("bf16-balanced")(xb), np.float32)
    # distinct compute schemes -> different roundings; both reconstruct
    assert np.abs(y_fast - y_bal).max() > 0
    ref = np.asarray(img)
    assert np.abs(y_bal - ref).max() <= np.abs(y_fast - ref).max() + 1e-3


def test_mode_pallas_path_on_chip(rng):
    """Round-5 late: non-periodization modes ride the fused kernels
    (extension-as-pad, see core/separable.py mode-kernel block) — the
    auto path must match the fma formulation at f32 roundoff across odd
    sizes, per-axis mixes and deep levels, and the linear-transpose VJP
    must be exact."""
    from pdwt_tpu.core.separable import _use_mode_pallas

    assert _use_mode_pallas(None, None, jnp.float32)
    for wname, n, m, mode, lv in [("db7", 1024, 512, "symmetric", 4),
                                  ("db2", 250, 198, "reflect", 3),
                                  ("db4", 96, 160,
                                   ("smooth", "antireflect"), 2)]:
        w = get_wavelet(wname)
        x = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)

        @jax.jit
        def both(a, w=w, lv=lv, mode=mode, n=n, m=m):
            y1 = sep.idwt2d(sep.dwt2d(a, w, lv, mode=mode), w, (n, m),
                            mode=mode)
            y2 = sep.idwt2d(sep.dwt2d(a, w, lv, mode=mode,
                                      backend="fma"), w, (n, m),
                            mode=mode, backend="fma")
            return jnp.max(jnp.abs(y1 - y2)), jnp.max(jnp.abs(y1 - a))

        dev, pr = (float(t) for t in both(x))
        assert dev < 2e-5 and pr < 2e-5, (wname, mode, dev, pr)

    w = get_wavelet("db3")
    x = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)

    def loss(a, backend=None):
        c = sep.dwt2d(a, w, 2, mode="symmetric", backend=backend)
        return jnp.sum(jnp.abs(sep.idwt2d(c, w, (128, 128),
                                          mode="symmetric",
                                          backend=backend)))

    g1 = jax.jit(jax.grad(loss))(x)
    g2 = jax.jit(jax.grad(lambda a: loss(a, "fma")))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_mode_pallas_1d_on_chip(rng):
    """Batched-1D boundary modes on the fused kernels (round-5 late):
    bit-identical to the fma formulation, exact VJP."""
    w = get_wavelet("sym8")
    x = jnp.asarray(rng.standard_normal((16, 1000)), jnp.float32)

    @jax.jit
    def both(a):
        y1 = sep.idwt1d(sep.dwt1d(a, w, 2, mode="symmetric"), w, 1000,
                        mode="symmetric")
        y2 = sep.idwt1d(sep.dwt1d(a, w, 2, mode="symmetric",
                                  backend="fma"), w, 1000,
                        mode="symmetric", backend="fma")
        return jnp.max(jnp.abs(y1 - y2)), jnp.max(jnp.abs(y1 - a))

    dev, pr = (float(t) for t in both(x))
    assert dev < 1e-6 and pr < 1e-5, (dev, pr)
