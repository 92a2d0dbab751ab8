"""Continuous wavelet transform (CWT) — scaleogram analysis.

Beyond the reference (PDWT is a DWT/SWT library); included because the
same tomography/signal users reach for scaleograms next, and the
transform maps perfectly onto TPU: ONE forward FFT of the signal, a
broadcast multiply against the whole scale bank, ONE batched inverse
FFT over a (scales, n) block — all XLA-fused, no Python loop over
scales.

Conventions are Torrence & Compo 1998 ("A Practical Guide to Wavelet
Analysis") exactly, so the reconstruction constants are citable:

* ``morlet`` (ω0 = 6): analytic, ψ̂0(sω) = π^{-1/4} H(ω) e^{-(sω-ω0)²/2},
  complex output; Fourier wavelength λ = 4πs / (ω0 + sqrt(2 + ω0²)).
* ``ricker`` (DOG m=2, a.k.a. mexican hat):
  ψ̂0(sω) = -Γ(2.5)^{-1/2} (sω)² e^{-(sω)²/2}, real output;
  λ = 2πs / sqrt(2.5).

Energy normalization ψ̂(sω_k) = sqrt(2πs/dt)·ψ̂0(sω) (T&C eq. 6) makes
|W|² directly comparable across scales.  :func:`icwt` implements the
delta-function reconstruction (T&C eq. 11) for log-spaced scales —
accurate to a few percent when the scales span the signal's band.

Everything is jit/vmap/grad-safe with static shapes; leading axes of
``x`` are batch.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

_OMEGA0 = 6.0
# T&C table 2: reconstruction factor Cδ and ψ0(0) per mother wavelet
_CDELTA = {"morlet": 0.776, "ricker": 3.541}
_PSI00 = {"morlet": math.pi ** -0.25, "ricker": 0.867}


def _ang_freq(n: int, dt: float) -> np.ndarray:
    """ω_k = 2πk/(n dt) with the sign convention of T&C eq. 5."""
    k = np.fft.fftfreq(n, d=dt)  # cycles per unit time
    return 2.0 * math.pi * k


def _psi_hat(wavelet: str, s: np.ndarray, omega: np.ndarray,
             dt: float) -> np.ndarray:
    """ψ̂(s_j ω_k), shape (S, n); numpy — scales are static."""
    so = s[:, None] * omega[None, :]
    if wavelet == "morlet":
        base = (math.pi ** -0.25) * np.exp(
            -0.5 * np.minimum((so - _OMEGA0) ** 2, 700.0))
        base = base * (omega[None, :] > 0)
    elif wavelet == "ricker":
        base = (-(so ** 2) * np.exp(-0.5 * np.minimum(so ** 2, 700.0))
                / math.sqrt(math.gamma(2.5)))
    else:
        raise ValueError(f"unknown wavelet {wavelet!r}; "
                         f"pick from {sorted(_CDELTA)}")
    norm = np.sqrt(2.0 * math.pi * s[:, None] / dt)
    return (norm * base).astype(np.float32)


def fourier_wavelength(wavelet: str, scales) -> np.ndarray:
    """Equivalent Fourier wavelength per scale (T&C table 1)."""
    s = np.asarray(scales, np.float64)
    if wavelet == "morlet":
        return 4.0 * math.pi * s / (_OMEGA0 + math.sqrt(2 + _OMEGA0 ** 2))
    if wavelet == "ricker":
        return 2.0 * math.pi * s / math.sqrt(2.5)
    raise ValueError(f"unknown wavelet {wavelet!r}")


def log_scales(n: int, dt: float = 1.0, *, dj: float = 0.125,
               s0: Optional[float] = None,
               j1: Optional[int] = None) -> np.ndarray:
    """T&C eq. 9-10 log-spaced scale grid: s_j = s0·2^{j·dj}, default
    s0 = 2dt up to the n·dt window."""
    s0 = 2.0 * dt if s0 is None else s0
    if j1 is None:
        j1 = int(math.log2(n * dt / s0) / dj)
    return s0 * 2.0 ** (dj * np.arange(j1 + 1))


def cwt(x: jnp.ndarray, scales, wavelet: str = "morlet", *,
        dt: float = 1.0) -> jnp.ndarray:
    """CWT over the trailing axis: returns ``batch + (S, n)`` —
    complex64 for ``morlet``, real for ``ricker``.  Periodic boundary
    (FFT), matching the DWT engines' boundary convention."""
    n = x.shape[-1]
    s = np.asarray(scales, np.float64)
    if s.ndim != 1 or s.size == 0 or (s <= 0).any():
        raise ValueError("scales must be a non-empty 1D positive array")
    psi = jnp.asarray(_psi_hat(wavelet, s, _ang_freq(n, dt), dt))
    X = jnp.fft.fft(x.astype(jnp.float32), axis=-1)
    # T&C eq. 4: W(s) = ifft(X · ψ̂(sω)); ψ̂ real, so no conjugate
    Wf = X[..., None, :] * psi
    W = jnp.fft.ifft(Wf, axis=-1)
    if wavelet == "ricker":
        return jnp.real(W)
    return W


def icwt(W: jnp.ndarray, scales, wavelet: str = "morlet", *,
         dt: float = 1.0, dj: float = 0.125) -> jnp.ndarray:
    """Approximate inverse (T&C eq. 11) for LOG-SPACED scales with
    spacing ``dj`` (e.g. from :func:`log_scales`):
    x_n = dj·sqrt(dt) / (Cδ ψ0(0)) · Σ_j Re(W_j)/sqrt(s_j)."""
    s = jnp.asarray(np.asarray(scales, np.float64), jnp.float32)
    fac = dj * math.sqrt(dt) / (_CDELTA[wavelet] * _PSI00[wavelet])
    return fac * jnp.sum(jnp.real(W) / jnp.sqrt(s)[..., :, None],
                         axis=-2)
