"""Pallas fused level kernels vs the gather oracle.

These only run on a real TPU (Mosaic kernels don't execute on the CPU
backend); the CPU suite covers the identical semantics via the fma/xla
backends, and the driver's TPU bench exercises this path end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as sep
from pdwt_tpu.filters import get_wavelet

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels need a TPU")


def _max_err(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize("wname", ["haar", "db7", "db20", "bior4.4"])
def test_pallas_level_matches_gather(rng, wname):
    w = get_wavelet(wname)
    x = jnp.asarray(rng.standard_normal((2, 256, 256)), dtype=jnp.float32)
    cp = sep.dwt2d(x, w, 2, backend="pallas")
    cg = sep.dwt2d(x, w, 2, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.idwt2d(cp, w, (256, 256), backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


def test_pallas_fallback_geometry(rng):
    """Odd sizes route through the fma fallback inside the pallas path."""
    w = get_wavelet("db3")
    x = jnp.asarray(rng.standard_normal((1, 94, 190)), dtype=jnp.float32)
    cp = sep.dwt2d(x, w, 2, backend="pallas")
    cg = sep.dwt2d(x, w, 2, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.idwt2d(cp, w, (94, 190), backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


@pytest.mark.parametrize("wname", ["db7", "bior4.4"])
def test_pallas_swt_matches_gather(rng, wname):
    w = get_wavelet(wname)
    x = jnp.asarray(rng.standard_normal((1, 256, 256)), dtype=jnp.float32)
    cp = sep.swt2d(x, w, 3, backend="pallas")
    cg = sep.swt2d(x, w, 3, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.iswt2d(cp, w, backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


def test_pallas_1d_matches_gather(rng):
    w = get_wavelet("sym8")
    x = jnp.asarray(rng.standard_normal((64, 2048)), dtype=jnp.float32)
    cp = sep.dwt1d(x, w, 3, backend="pallas")
    cg = sep.dwt1d(x, w, 3, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.idwt1d(cp, w, 2048, backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


def test_pallas_haar_api_dispatch(rng):
    """On TPU the API routes haar through the pallas separable path;
    values must equal the dedicated butterfly core."""
    from pdwt_tpu.core import haar as haar_core
    x = jnp.asarray(rng.standard_normal((128, 128)), dtype=jnp.float32)
    c1 = haar_core.haar_dwt2d(x, 2)
    c2 = sep.dwt2d(x, get_wavelet("haar"), 2, backend="pallas")
    assert _max_err(c1, c2) < 1e-5


def test_pallas_swt1d_matches_gather(rng):
    w = get_wavelet("sym8")
    x = jnp.asarray(rng.standard_normal((64, 2048)), dtype=jnp.float32)
    cp = sep.swt1d(x, w, 3, backend="pallas")
    cg = sep.swt1d(x, w, 3, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.iswt1d(cp, w, backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


def test_pallas_odd_sizes_via_virtual_extension(rng):
    w = get_wavelet("db7")
    x = jnp.asarray(rng.standard_normal((1, 511, 1023)), dtype=jnp.float32)
    cp = sep.dwt2d(x, w, 2, backend="pallas")
    cg = sep.dwt2d(x, w, 2, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.idwt2d(cp, w, (511, 1023), backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


def test_pallas_grad_matches_fma(rng):
    """Custom VJPs: jax.grad through the pallas path equals autodiff
    through the (natively differentiable) fma path."""
    w = get_wavelet("db7")
    x = jnp.asarray(rng.standard_normal((128, 256)), dtype=jnp.float32)

    def loss(v, be):
        c = sep.dwt2d(v, w, 2, backend=be)
        y = sep.idwt2d(c, w, (128, 256), backend=be)
        return jnp.sum((y - 0.5 * v) ** 2)

    gp = jax.jit(jax.grad(lambda v: loss(v, "pallas")))(x)
    gf = jax.jit(jax.grad(lambda v: loss(v, "fma")))(x)
    assert float(jnp.abs(gp - gf).max()) < 1e-4

    def loss_swt(v, be):
        c = sep.swt2d(v, w, 2, backend=be)
        return jnp.sum(sep.iswt2d(c, w, backend=be) * v)

    gp = jax.jit(jax.grad(lambda v: loss_swt(v, "pallas")))(x)
    gf = jax.jit(jax.grad(lambda v: loss_swt(v, "fma")))(x)
    assert float(jnp.abs(gp - gf).max()) < 1e-4


def test_tail_fusion_matches_gather(rng):
    """Trailing-level fused kernel (all levels in one VMEM-resident
    invocation for small images) vs the gather oracle."""
    w = get_wavelet("db7")
    x = jnp.asarray(rng.standard_normal((1, 256, 256)), dtype=jnp.float32)
    cp = sep.dwt2d(x, w, 4, backend="pallas")   # whole transform fused
    cg = sep.dwt2d(x, w, 4, backend="gather")
    assert _max_err(cp, cg) < 1e-4
    yp = sep.idwt2d(cp, w, (256, 256), backend="pallas")
    assert float(jnp.abs(yp - x).max()) < 1e-4


def test_bf16_mxu_pipeline(rng):
    """bf16 serving mode: MXU banded-matmul kernels, bf16 arrays in/out.
    Error bound: bf16 coefficient storage rounds at 2^-8 of the (growing)
    approximation scale."""
    w = get_wavelet("db7")
    x32 = jnp.asarray(rng.uniform(0, 255, (1, 1024, 1024)), jnp.float32)
    xb = x32.astype(jnp.bfloat16)
    cb = sep.dwt2d(xb, w, 2, backend="pallas")
    assert cb.approx.dtype == jnp.bfloat16
    cg = sep.dwt2d(x32, w, 2, backend="gather")
    rel = _max_err(jax.tree.map(lambda t: t.astype(jnp.float32), cb), cg)
    rel /= float(jnp.abs(cg.approx).max())
    assert rel < 3e-2
    yb = sep.idwt2d(cb, w, (1024, 1024), backend="pallas")
    assert yb.dtype == jnp.bfloat16
    err = float(jnp.abs(yb.astype(jnp.float32)
                        - xb.astype(jnp.float32)).max())
    assert err < 0.05 * 255  # bf16 end-to-end bound on [0,255] data


def test_mixed_precision_mxu(rng, monkeypatch):
    """PDWT_TPU_PRECISION=mixed: f32 arrays, bf16x3 MXU compute ->
    ~1e-5 relative coefficient error, ~1.5-2.5x faster than exact."""
    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (1, 1024, 1024)), jnp.float32)
    cm = sep.dwt2d(x, w, 2, backend="pallas")
    cg = sep.dwt2d(x, w, 2, backend="gather")
    rel = _max_err(cm, cg) / float(jnp.abs(cg.approx).max())
    assert rel < 1e-4
    ym = sep.idwt2d(cm, w, (1024, 1024), backend="pallas")
    assert float(jnp.abs(ym - x).max()) < 1e-2 * 255
