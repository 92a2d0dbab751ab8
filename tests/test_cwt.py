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
