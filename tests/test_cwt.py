"""Continuous wavelet transform (Torrence & Compo conventions) —
beyond the reference (PDWT is DWT/SWT only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import continuous as C


def test_cwt_tone_peaks_at_fourier_wavelength(rng):
    """A pure tone's scaleogram power peaks at the scale whose
    equivalent Fourier wavelength is 1/f, for both mothers."""
    n, dt, f = 1024, 1.0, 1 / 32.0
    t = np.arange(n) * dt
    x = jnp.asarray(np.cos(2 * np.pi * f * t), jnp.float32)
    scales = C.log_scales(n, dt, dj=0.05)
    for wavelet in ("morlet", "ricker"):
        W = C.cwt(x, scales, wavelet, dt=dt)
        power = np.asarray(jnp.mean(jnp.abs(W) ** 2, axis=-1))
        lam = C.fourier_wavelength(wavelet, scales)
        lam_peak = lam[int(np.argmax(power))]
        assert abs(lam_peak - 1 / f) / (1 / f) < 0.08, (wavelet, lam_peak)


def test_cwt_linear_and_shift_covariant(rng):
    n = 256
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    s = C.log_scales(n)
    Wx, Wy = C.cwt(x, s), C.cwt(y, s)
    Wxy = C.cwt(2.0 * x - 3.0 * y, s)
    np.testing.assert_allclose(np.asarray(Wxy),
                               np.asarray(2.0 * Wx - 3.0 * Wy),
                               atol=1e-3)
    # periodic boundary -> exact circular-shift covariance
    Wsh = C.cwt(jnp.roll(x, 17), s)
    np.testing.assert_allclose(np.asarray(Wsh),
                               np.asarray(jnp.roll(Wx, 17, axis=-1)),
                               atol=1e-3)


def test_icwt_reconstruction(rng):
    """T&C delta reconstruction: a band-limited signal round-trips
    within a few percent over a dj=0.125 log grid."""
    n, dt = 512, 1.0
    t = np.arange(n) * dt
    sig = (np.sin(2 * np.pi * t / 31.0) + 0.6 * np.cos(2 * np.pi * t / 97.0)
           ).astype(np.float32)
    x = jnp.asarray(sig)
    dj = 0.125
    scales = C.log_scales(n, dt, dj=dj)
    W = C.cwt(x, scales, "morlet", dt=dt)
    rec = np.asarray(C.icwt(W, scales, "morlet", dt=dt, dj=dj))
    rel = np.abs(rec - sig).max() / np.abs(sig).max()
    assert rel < 0.05, rel


def test_cwt_batched_jit_grad(rng):
    n = 128
    x = jnp.asarray(rng.standard_normal((3, 2, n)), jnp.float32)
    s = C.log_scales(n)[:10]
    W = jax.jit(lambda v: C.cwt(v, s))(x)
    assert W.shape == (3, 2, 10, n) and W.dtype == jnp.complex64
    # batch independence
    W0 = C.cwt(x[0, 0], s)
    np.testing.assert_allclose(np.asarray(W[0, 0]), np.asarray(W0),
                               atol=1e-5)
    g = jax.grad(lambda v: float(0) + jnp.sum(jnp.abs(
        C.cwt(v, s)) ** 2))(x[0, 0])
    assert np.isfinite(np.asarray(g)).all()
    # ricker output is real
    Wr = C.cwt(x[0, 0], s, "ricker")
    assert not jnp.iscomplexobj(Wr)


def test_cwt_errors():
    with pytest.raises(ValueError, match="unknown wavelet"):
        C.cwt(jnp.zeros(32), C.log_scales(32), "nope")
    with pytest.raises(ValueError, match="scales"):
        C.cwt(jnp.zeros(32), [])
    with pytest.raises(ValueError, match="scales"):
        C.cwt(jnp.zeros(32), [-1.0])


def test_paul_tone_peak_and_reconstruction(rng):
    """Paul (m=4) mother: tone power peaks at its Fourier wavelength;
    delta reconstruction recovers a band-limited signal within the T&C
    approximation bound."""
    n, dt, f = 1024, 1.0, 1 / 24.0
    t = np.arange(n) * dt
    x = jnp.asarray(np.cos(2 * np.pi * f * t), jnp.float32)
    dj = 0.05
    scales = C.log_scales(n, dt, dj=dj)
    W = C.cwt(x, scales, "paul", dt=dt)
    assert np.iscomplexobj(np.asarray(W))
    power = np.asarray(jnp.mean(jnp.abs(W) ** 2, axis=-1))
    lam = C.fourier_wavelength("paul", scales)
    lam_peak = lam[int(np.argmax(power))]
    assert abs(lam_peak - 1 / f) / (1 / f) < 0.08
    # reconstruction (measured bound: T&C eq.11 is a few-% method)
    xr = np.asarray(C.icwt(W, scales, "paul", dt=dt, dj=dj))
    rel = np.linalg.norm(xr - np.asarray(x)) / np.linalg.norm(np.asarray(x))
    assert rel < 0.06, rel


def test_cone_of_influence():
    n, dt = 256, 0.5
    coi = C.cone_of_influence(n, dt, "morlet")
    assert coi.shape == (n,)
    # symmetric, growing toward the middle, scale units
    np.testing.assert_allclose(coi, coi[::-1])
    assert coi[0] < coi[n // 2]
    assert abs(coi[0] - 0.5 * dt / np.sqrt(2)) < 1e-12
    # paul's shorter e-folding admits LARGER scales near the edge
    assert C.cone_of_influence(n, dt, "paul")[0] > coi[0]
    with pytest.raises(ValueError):
        C.cone_of_influence(n, dt, "haar")


def test_cwt2d_ridge_at_known_scale_and_orientation(rng):
    """A plane wave lights up the (scale, θ) cell matching its
    wavenumber and direction."""
    nr = nc = 128
    f = 1 / 16.0  # cycles/pixel along +x rotated by 30°
    th0 = np.deg2rad(30.0)
    yy, xx = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    phase = 2 * np.pi * f * (np.cos(th0) * xx + np.sin(th0) * yy)
    img = jnp.asarray(np.cos(phase), jnp.float32)
    scales = np.asarray([2.0, 4.0, 16 * 6.0 / (2 * np.pi), 32.0])
    thetas = np.deg2rad([0.0, 30.0, 90.0, 120.0])
    W = C.cwt2d(img, scales, thetas)
    assert W.shape == (len(scales), len(thetas), nr, nc)
    power = np.asarray(jnp.mean(jnp.abs(W) ** 2, axis=(-2, -1)))
    j, i = np.unravel_index(np.argmax(power), power.shape)
    # expected scale: |k| = 2πf -> s = ω0/|k| = 6/(2πf) = 16·6/2π
    assert (j, i) == (2, 1), power
    # analytic bank: the +k and -k plane-wave halves split across θ and
    # θ+π — power at 30° must dominate the orthogonal orientation
    assert power[2, 1] > 5 * power[2, 2]


def test_cwt2d_batched_jit(rng):
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
    s = np.asarray([2.0, 4.0])
    W = jax.jit(lambda x: C.cwt2d(x, s))(imgs)
    assert W.shape == (2, 2, 4, 32, 32)
    with pytest.raises(ValueError):
        C.cwt2d(imgs, np.asarray([-1.0]))
