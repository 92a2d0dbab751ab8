"""Starlet (isotropic à-trous) transform — beyond the reference
(PDWT has no isotropic transform; its SWT is the oriented separable
à-trous, src/separable.cu:409-493)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import starlet as S_mod
from pdwt_tpu.core.starlet import (B3_SPLINE, StarletCoeffs, istarlet,
                                   starlet, starlet_denoise)


@pytest.mark.parametrize("gen", [1, 2])
@pytest.mark.parametrize("ndim,shape", [(1, (128,)), (2, (64, 48)),
                                        (3, (16, 24, 32))])
def test_starlet_perfect_reconstruction(rng, gen, ndim, shape):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float64)
    c = starlet(x, 3, ndim=ndim, gen=gen)
    assert c.levels == 3
    assert c.approx.shape == shape
    assert all(w.shape == shape for w in c.details)
    y = istarlet(c, ndim=ndim, gen=gen)
    assert float(jnp.abs(y - x).max()) < 1e-12


def test_starlet_batched_and_oracle(rng):
    """Leading axes are batch; level-1 smooth equals the numpy
    separable B3 correlation with periodic wrap (spec: core/conv.py)."""
    x = jnp.asarray(rng.standard_normal((3, 32, 32)), jnp.float64)
    c = starlet(x, 2, ndim=2)
    c0 = starlet(x[1], 2, ndim=2)
    assert float(jnp.abs(c.details[0][1] - c0.details[0]).max()) < 1e-14

    # numpy oracle for one periodic B3 smoothing of a row signal
    v = np.asarray(x[0, 0], np.float64)
    n = v.size
    sm = np.zeros_like(v)
    cen = 2  # fwd_center(5) = hlen//2 for the odd symmetric kernel
    taps = np.asarray(B3_SPLINE)[::-1]
    for m in range(n):
        sm[m] = sum(taps[j] * v[(m - cen + j) % n] for j in range(5))
    a1 = starlet(x[0, 0], 1, ndim=1)
    got = np.asarray(a1.approx, np.float64)
    assert np.abs(got - sm).max() < 1e-14


def test_starlet_jit_grad_and_denoise(rng):
    x = jnp.asarray(rng.standard_normal((64, 64)) * 10, jnp.float32)

    @jax.jit
    def dn(v):
        return starlet_denoise(v, 3, 1.0, mode="soft")

    y = dn(x)
    assert y.shape == x.shape
    g = jax.grad(lambda v: jnp.sum(dn(v) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g)))

    # per-level betas + garrote mode run; zero threshold == roundtrip
    y0 = starlet_denoise(x, 2, [0.0, 0.0], mode="garrote")
    assert float(jnp.abs(y0 - x).max()) < 1e-4

    with pytest.raises(ValueError, match="betas"):
        starlet_denoise(x, 3, [1.0, 2.0])
    with pytest.raises(ValueError, match="gen"):
        starlet(x, 2, gen=3)
    with pytest.raises(ValueError, match="ndim"):
        starlet(x, 2, ndim=4)


def test_starlet_energy_compaction_on_smooth_signal(rng):
    """A smooth (lowpass) image puts most energy into the coarse
    planes — sanity that scales order finest-first."""
    t = np.linspace(0, 2 * np.pi, 64)
    img = jnp.asarray(np.sin(t)[:, None] * np.cos(t)[None, :],
                      jnp.float64)
    c = starlet(img, 3, ndim=2)
    e = [float(jnp.sum(w ** 2)) for w in c.details]
    assert e[0] < e[-1]  # finest plane has the least energy


@pytest.mark.slow
def test_sharded_starlet_bit_identical(rng):
    """Sharded starlet over the 8-device CPU mesh == single-device,
    2D (row+col rings) and 3D (three rings), fwd and inverse."""
    import pdwt_tpu.parallel as par

    mesh = par.make_mesh((2, 2, 2), ("data", "row", "col"))
    x = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.float32)
    ref = starlet(x, 3, ndim=2, backend="fma")  # match the sharded local backend
    c = par.starlet(x, 3, mesh, data_axis="data",
                    spatial_axes=("row", "col"))
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(c)):
        assert float(jnp.abs(a - b).max()) == 0.0
    y = par.istarlet(c, mesh, data_axis="data",
                     spatial_axes=("row", "col"))
    assert float(jnp.abs(y - istarlet(ref, ndim=2,
                                      backend="fma")).max()) == 0.0

    # 3D: halo rings on all three axes (no data axis)
    v = jnp.asarray(rng.standard_normal((16, 16, 16)), jnp.float32)
    mesh3 = par.make_mesh((2, 2, 2), ("dep", "row", "col"))
    ref3 = starlet(v, 2, ndim=3, backend="fma")
    c3 = par.starlet(v, 2, mesh3, spatial_axes=("dep", "row", "col"))
    for a, b in zip(jax.tree.leaves(ref3), jax.tree.leaves(c3)):
        assert float(jnp.abs(a - b).max()) == 0.0

    with pytest.raises(ValueError, match="divisible"):
        par.starlet(jnp.zeros((2, 63, 64)), 2, mesh, data_axis="data",
                    spatial_axes=("row", "col"))


def test_starlet_noise_gains_match_sampled_noise(rng):
    """starlet_noise_gains == the measured per-plane std of transformed
    unit white noise (the published Starck sigma_j table: 2D gen-1
    leads 0.889, 0.200, 0.086, ...)."""
    from pdwt_tpu.core.starlet import starlet_noise_gains

    g = starlet_noise_gains(5, 2, 1)
    assert np.allclose(g[:3], (0.8908, 0.2007, 0.0855), atol=2e-4)

    x = jnp.asarray(rng.standard_normal((256, 256)), jnp.float64)
    for gen in (1, 2):
        c = starlet(x, 3, ndim=2, gen=gen)
        gg = starlet_noise_gains(3, 2, gen)
        for w, expect in zip(c.details, gg):
            got = float(jnp.std(w))
            assert abs(got - expect) / expect < 0.08, (gen, expect, got)


def test_starlet_auto_denoise(rng):
    """k-sigma auto denoise reduces noise on a piecewise-smooth image
    and runs jitted; per-level k sequences validate."""
    from pdwt_tpu.models import starlet_auto_denoise

    t = np.linspace(0, 4 * np.pi, 128)
    clean = np.sin(t)[:, None] * np.cos(t)[None, :] * 50
    noisy = jnp.asarray(clean + rng.standard_normal((128, 128)) * 10,
                        jnp.float32)

    y = jax.jit(lambda v: starlet_auto_denoise(v, 4))(noisy)
    mse_in = float(jnp.mean((noisy - clean) ** 2))
    mse_out = float(jnp.mean((y - clean) ** 2))
    assert mse_out < 0.35 * mse_in

    y2 = starlet_auto_denoise(noisy, 3, k=[4.0, 3.0, 3.0], gen=1)
    assert y2.shape == noisy.shape
    with pytest.raises(ValueError, match="k values"):
        starlet_auto_denoise(noisy, 3, k=[1.0])
