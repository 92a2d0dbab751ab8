"""Fully separable (anisotropic) transform — beyond the reference,
which only has the square Mallat recursion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import anisotropic as A
from pdwt_tpu.core import separable as S
from pdwt_tpu.filters import get_wavelet


@pytest.mark.parametrize("shape,levels", [
    ((64, 64), (2, 3)),
    ((37, 53), (3, 1)),          # odd sizes, asymmetric depths
    ((8, 48, 64), (1, 2, 3)),    # anisotropic volume
    ((5, 32, 32), (0, 2, 2)),    # depth axis untransformed
])
def test_fs_roundtrip(rng, shape, levels):
    w = get_wavelet("db3")
    x = jnp.asarray(rng.standard_normal(shape))
    y = A.fs_dwt(x, w, levels)
    rec = A.fs_idwt(y, w, shape, levels)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-9)


def test_fs_one_level_equals_mallat(rng):
    """At one level per axis the fully separable and Mallat bases
    coincide: the four packed blocks are exactly (A, V, H, D)."""
    w = get_wavelet("db4")
    x = jnp.asarray(rng.standard_normal((64, 96)))
    y = A.fs_dwt(x, w, (1, 1))
    sl = A.fs_slices((64, 96), (1, 1))
    c = S.dwt2d(x, w, 1)
    h, v, d = c.details[0]
    np.testing.assert_allclose(np.asarray(y[sl[0]["a"], sl[1]["a"]]),
                               np.asarray(c.approx), atol=1e-10)
    # H = highpass along rows (axis -2) = detail block on axis 0
    np.testing.assert_allclose(np.asarray(y[sl[0]["d1"], sl[1]["a"]]),
                               np.asarray(h), atol=1e-10)
    np.testing.assert_allclose(np.asarray(y[sl[0]["a"], sl[1]["d1"]]),
                               np.asarray(v), atol=1e-10)
    np.testing.assert_allclose(np.asarray(y[sl[0]["d1"], sl[1]["d1"]]),
                               np.asarray(d), atol=1e-10)


@pytest.mark.slow
def test_fs_energy_and_batch_and_grad(rng):
    """Orthogonal bank conserves energy (even sizes); leading batch
    axes ride along; the packed transform is differentiable."""
    w = get_wavelet("sym6")
    x = jnp.asarray(rng.standard_normal((3, 64, 32)), jnp.float32)
    y = A.fs_dwt(x, w, (2, 3))
    assert y.shape[0] == 3
    np.testing.assert_allclose(float(jnp.sum(y * y)),
                               float(jnp.sum(x * x)), rtol=1e-5)

    g = jax.grad(lambda v: jnp.sum(
        A.fs_idwt(A.fs_dwt(v, w, (2, 3)), w, (64, 32), (2, 3)) ** 2))(
            x[0])
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x[0]),
                               rtol=1e-4, atol=1e-4)


def test_fs_slices_cover(rng):
    sl = A.fs_slices((37, 53), (3, 2))
    for d, n, lv in zip(sl, (37, 53), (3, 2)):
        assert list(d) == ["a"] + [f"d{l}" for l in range(lv, 0, -1)]
        stops = [s.stop for s in d.values()]
        starts = [s.start for s in d.values()]
        assert starts[0] == 0 and starts[1:] == stops[:-1]
    with pytest.raises(ValueError):
        A.fs_dwt(jnp.zeros((8, 8)), get_wavelet("db2"), 1)  # scalar, no ndim
    with pytest.raises(ValueError):
        A.fs_dwt(jnp.zeros((8,)), get_wavelet("db2"), (1, 1))
