"""End-to-end denoise QUALITY regression (PSNR floors).

The rest of the suite proves self-consistency (PR, backend equality,
threshold math); this file pins the actual output quality of the
flagship denoising pipelines on a fixed-seed synthetic phantom so a
regression in any stage (estimators, thresholds, reconstruction)
surfaces as a dB drop.  Floors are the 2026-08-20 CPU measurements
(tools history: noisy 20.16 dB at sigma=25 on [0,255]) minus ~0.5 dB
margin; pipelines are deterministic, so drops beyond that are real.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu import models
from pdwt_tpu.core.dualtree import dtcwt_auto_denoise

SIGMA = 25.0


def phantom(n=256):
    """Piecewise-smooth phantom: gradient background, three ellipses,
    a band-limited texture patch — edges + smooth regions + texture."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    img = 40.0 + 60.0 * (xx + 1)
    img += 120.0 * (((xx + 0.15) / 0.55) ** 2 + ((yy + 0.1) / 0.7) ** 2 < 1)
    img -= 70.0 * (((xx + 0.35) / 0.18) ** 2 + ((yy + 0.2) / 0.3) ** 2 < 1)
    img += 90.0 * (((xx - 0.3) / 0.22) ** 2 + ((yy - 0.25) / 0.12) ** 2 < 1)
    img += 25.0 * np.sin(10 * xx) * np.cos(7 * yy) * (np.abs(yy) < 0.5)
    return np.clip(img, 0, 255).astype(np.float32)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(255.0 ** 2 / mse)


@pytest.fixture(scope="module")
def noisy_pair():
    rng = np.random.default_rng(20260820)
    clean = phantom()
    noisy = (clean + SIGMA * rng.standard_normal(clean.shape)
             ).astype(np.float32)
    assert 19.9 < psnr(noisy, clean) < 20.4  # fixture sanity
    return clean, jnp.asarray(noisy)


# (label, fn, pinned floor in dB) — measured 2026-08-20 minus margin
CASES = [
    ("dwt-bayes", lambda x: models.auto_denoise(x, "db8", 4,
                                                method="bayes"), 28.8),
    ("swt-bayes", lambda x: models.auto_denoise(x, "db8", 4, method="bayes",
                                                swt=True), 29.5),
    ("swt-sure", lambda x: models.auto_denoise(x, "sym8", 4, method="sure",
                                               swt=True), 29.8),
    ("packet", lambda x: models.packet_denoise(x, "db8", 3), 26.4),
    ("starlet", lambda x: models.starlet_auto_denoise(x, 4), 24.9),
    ("dtcwt", lambda x: dtcwt_auto_denoise(x, 4), 28.2),
]


@pytest.mark.parametrize("label,fn,floor", CASES,
                         ids=[c[0] for c in CASES])
def test_denoise_psnr_floor(noisy_pair, label, fn, floor):
    clean, noisy = noisy_pair
    out = fn(noisy)
    got = psnr(out, clean)
    base = psnr(noisy, clean)
    assert got >= floor, f"{label}: {got:.2f} dB < floor {floor}"
    assert got >= base + 4.5, f"{label}: only {got - base:.2f} dB gain"


def test_symmetric_boundary_edge_psnr_gain(noisy_pair):
    """The round-5 boundary modes are a measurable QUALITY feature, not
    just pywt parity: on this non-periodic phantom (gradient background,
    left edge != right edge), BayesShrink-DWT denoising with
    boundary='symmetric' measured +7.7 dB in the 8-pixel edge band and
    +0.8 dB overall vs the periodic wrap (2026-08-20: edge 27.16 ->
    34.83 dB, full 29.40 -> 30.23).  Floors pinned with ~0.5 dB margin."""
    clean, noisy = noisy_pair

    def edge_psnr(img):
        bands = np.concatenate([
            np.asarray(img)[:8].ravel(), np.asarray(img)[-8:].ravel(),
            np.asarray(img)[:, :8].ravel(), np.asarray(img)[:, -8:].ravel()])
        ref = np.concatenate([clean[:8].ravel(), clean[-8:].ravel(),
                              clean[:, :8].ravel(), clean[:, -8:].ravel()])
        return 10 * np.log10(255.0 ** 2 / np.mean((bands - ref) ** 2))

    per = models.auto_denoise(noisy, "db8", 4, boundary="periodization")
    sym = models.auto_denoise(noisy, "db8", 4, boundary="symmetric")
    assert psnr(sym, clean) >= 29.7
    assert edge_psnr(sym) >= 34.3
    assert edge_psnr(sym) >= edge_psnr(per) + 5.0
    with pytest.raises(ValueError):
        models.auto_denoise(noisy, "db8", 4, boundary="symmetric", swt=True)
