"""Dual-tree complex wavelet transform — beyond the reference (PDWT
has DWT/SWT only).  The filter banks are DESIGNED at import (Selesnick
common-factor: Thiran allpass + halfband solve + spectral
factorization), so these tests pin both the design identities and the
transform properties."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as S
from pdwt_tpu.core.dualtree import (design_dtcwt_banks, dtcwt1d, dtcwt2d,
                                    dtcwt_denoise, dtcwt_wavelets,
                                    idtcwt1d, idtcwt2d)
from pdwt_tpu.filters import get_wavelet


def _psi_hat(h0, w, J=12):
    n = np.arange(len(h0))
    N = len(h0)
    h1 = np.array([(-1) ** k * h0[N - 1 - k] for k in range(N)])
    frf = lambda f, ww: (f[None, :]
                         * np.exp(-1j * np.outer(ww, n))).sum(1)
    out = frf(h1, w / 2) / np.sqrt(2)
    for j in range(2, J + 1):
        out = out * frf(h0, w / 2 ** j) / np.sqrt(2)
    return out


def test_design_orthonormal_and_analytic():
    """Each designed bank is an orthonormal CQF to machine precision;
    the pair's complex wavelet psi_A + i psi_B has < 2% of its energy
    at negative frequencies (frequency-domain infinite product)."""
    h0, g0 = design_dtcwt_banks(2, 4)
    for f in (h0, g0):
        assert abs(np.linalg.norm(f) - 1) < 1e-12
        assert abs(f.sum() - np.sqrt(2)) < 1e-10   # K zeros at z=-1
        P = np.convolve(f, f[::-1])
        c = len(P) // 2
        assert np.abs(P[c + 2::2]).max() < 1e-12   # halfband = CQF
    w = np.linspace(-8 * np.pi, 8 * np.pi, 20001)
    Ph, Pg = _psi_hat(h0, w), _psi_hat(g0, w)
    neg = min(
        float(np.trapezoid(np.abs(Ph + 1j * s * Pg)[w < 0] ** 2,
                           w[w < 0])
              / np.trapezoid(np.abs(Ph + 1j * s * Pg) ** 2, w))
        for s in (1, -1))
    assert neg < 0.02, neg


def test_dtcwt_wavelets_are_valid_banks(rng):
    """The designed banks run as ordinary Wavelets through the
    framework's own engine (PR via dwt1d/idwt1d roundtrip)."""
    wa, wb = dtcwt_wavelets()
    x = jnp.asarray(rng.standard_normal(128), jnp.float64)
    for w in (wa, wb):
        y = S.idwt1d(S.dwt1d(x, w, 3), w, 128)
        assert float(jnp.abs(y - x).max()) < 1e-12


@pytest.mark.parametrize("levels", [1, 3])
def test_dtcwt_perfect_reconstruction(rng, levels):
    x = jnp.asarray(rng.standard_normal((2, 128)), jnp.float64)
    c = dtcwt1d(x, levels)
    assert all(jnp.iscomplexobj(d) for d in c.details)
    y = idtcwt1d(c, 128)
    assert float(jnp.abs(y - x).max()) < 1e-12

    img = jnp.asarray(rng.standard_normal((64, 64)), jnp.float64)
    c2 = dtcwt2d(img, levels)
    assert c2.details[0].shape == (6, 32, 32)
    assert c2.approx.shape[0] == 4
    y2 = idtcwt2d(c2, (64, 64))
    assert float(jnp.abs(y2 - img).max()) < 1e-12


def test_dtcwt_shift_invariance_vs_dwt():
    """The raison d'etre: complex-magnitude energy per level barely
    moves under input shifts, where the real DWT's swings wildly."""
    n, lvl = 256, 3
    w = get_wavelet("db7")
    sw_dt, sw_dwt = [], []
    for level_pick in range(lvl):
        e_dt, e_dwt = [], []
        for s in range(8):
            x = jnp.zeros(n, jnp.float64).at[n // 2 + s].set(1.0)
            c = dtcwt1d(x, lvl)
            e_dt.append(float(jnp.sum(jnp.abs(c.details[level_pick]) ** 2)))
            cd = S.dwt1d(x, w, lvl)
            e_dwt.append(float(jnp.sum(cd.details[level_pick] ** 2)))
        swing = lambda e: (max(e) - min(e)) / np.mean(e)
        sw_dt.append(swing(e_dt))
        sw_dwt.append(swing(e_dwt))
    assert sw_dt[0] < 1e-10                  # level 1 exactly invariant
    for a, b in zip(sw_dt[1:], sw_dwt[1:]):
        assert a < 0.2
        assert a < b / 3


def test_dtcwt2d_orientation_selectivity():
    """±45° gratings are separated by the two diagonal complex bands
    (a real DWT cannot distinguish them: one 'd' band sees both)."""
    n = 64
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    plus = jnp.asarray(np.cos(2 * np.pi * (i + j) * 0.25), jnp.float64)
    minus = jnp.asarray(np.cos(2 * np.pi * (i - j) * 0.25), jnp.float64)
    ep, em = [], []
    for img in (plus, minus):
        z = dtcwt2d(img, 1).details[0]
        e = [float(jnp.sum(jnp.abs(z[k]) ** 2)) for k in range(6)]
        d_pair = e[4], e[5]
        ep.append(d_pair)
    (p1, p2), (m1, m2) = ep
    # each grating concentrates in ONE of the diagonal pair, and they
    # pick opposite members
    assert max(p1, p2) > 5 * min(p1, p2)
    assert max(m1, m2) > 5 * min(m1, m2)
    assert (p1 > p2) != (m1 > m2)


@pytest.mark.slow
def test_dtcwt_denoise_and_grad(rng):
    t = np.linspace(0, 4 * np.pi, 128)
    clean = np.sin(t)[:, None] * np.cos(t)[None, :] * 50
    noisy = jnp.asarray(clean + rng.standard_normal((128, 128)) * 10,
                        jnp.float32)
    dn = jax.jit(lambda v: dtcwt_denoise(v, 3, 25.0))
    y = dn(noisy)
    assert float(jnp.mean((y - clean) ** 2)) \
        < 0.4 * float(jnp.mean((noisy - clean) ** 2))
    g = jax.grad(lambda v: jnp.sum(dn(v) ** 2))(noisy)
    assert bool(jnp.all(jnp.isfinite(g)))
    with pytest.raises(ValueError, match="betas"):
        dtcwt_denoise(noisy, 3, [1.0])
    with pytest.raises(ValueError, match="divisible"):
        dtcwt1d(jnp.zeros(100), 3)


def test_dtcwt2d_gspmd_sharded(rng):
    """The composed DTCWT runs under jit with a spatially sharded input
    (GSPMD inserts the halo exchanges and circular-shift collectives) —
    same result as unsharded to f32 roundoff.  The explicit-shard_map
    engines cover the pyramid transforms; the dual tree rides XLA's
    automatic propagation instead."""
    import jax.sharding as jsh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = jsh.Mesh(devs, ("row", "col"))
    spec = jsh.NamedSharding(mesh, jsh.PartitionSpec("row", "col"))
    img = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    ref = dtcwt_denoise(img, 2, 1.0)
    xs = jax.device_put(img, spec)
    out = jax.jit(lambda v: dtcwt_denoise(v, 2, 1.0))(xs)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_dtcwt_auto_denoise(rng):
    """k-sigma magnitude denoise with the Rayleigh-median sigma
    estimate: the estimated sigma matches the truth on pure noise, and
    the zero-knob call beats the noisy input on a smooth image."""
    from pdwt_tpu.core.dualtree import dtcwt_auto_denoise

    noise = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((256, 256)) * 7, jnp.float32)
    c = dtcwt2d(noise, 1)
    sigma_hat = float(jnp.median(jnp.abs(c.details[0]))
                      / np.sqrt(np.log(4.0)))
    assert abs(sigma_hat - 7) / 7 < 0.05     # orthonormal: gain == 1

    t = np.linspace(0, 4 * np.pi, 128)
    clean = np.sin(t)[:, None] * np.cos(t)[None, :] * 50
    noisy = jnp.asarray(clean + rng.standard_normal((128, 128)) * 10,
                        jnp.float32)
    y = jax.jit(lambda v: dtcwt_auto_denoise(v, 3))(noisy)
    assert float(jnp.mean((y - clean) ** 2)) \
        < 0.35 * float(jnp.mean((noisy - clean) ** 2))
    with pytest.raises(ValueError, match="k values"):
        dtcwt_auto_denoise(noisy, 3, k=[1.0])
