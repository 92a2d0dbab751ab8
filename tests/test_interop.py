"""pywt coefficient-container interop (structure round-trips)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as S
from pdwt_tpu.core import separable3d as S3
from pdwt_tpu.filters import get_wavelet
from pdwt_tpu.utils import from_pywt, to_pywt


def test_interop_2d_roundtrip(rng):
    w = get_wavelet("db3")
    x = jnp.asarray(rng.standard_normal((32, 48)))
    c = S.dwt2d(x, w, 3)
    cl = to_pywt(c)
    assert len(cl) == 4  # cA3 + 3 levels
    # coarsest-first: cl[1] is level 3, cl[3] is level 1
    np.testing.assert_array_equal(np.asarray(cl[1][0]),
                                  np.asarray(c.details[2][0]))
    np.testing.assert_array_equal(np.asarray(cl[3][2]),
                                  np.asarray(c.details[0][2]))
    c2 = from_pywt(cl)
    assert type(c2) is type(c)
    for a, b in zip(jax.tree_util.tree_leaves(c),
                    jax.tree_util.tree_leaves(c2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the round-tripped pytree inverts identically
    np.testing.assert_allclose(np.asarray(S.idwt2d(c2, w, (32, 48))),
                               np.asarray(x), atol=1e-10)


def test_interop_1d_and_3d_roundtrip(rng):
    w = get_wavelet("db2")
    s = jnp.asarray(rng.standard_normal((4, 64)))
    c1 = S.dwt1d(s, w, 3)
    cl1 = to_pywt(c1)
    assert len(cl1) == 4 and not isinstance(cl1[1], (tuple, dict))
    c1b = from_pywt(cl1)
    np.testing.assert_array_equal(np.asarray(c1b.details[0]),
                                  np.asarray(c1.details[0]))

    v = jnp.asarray(rng.standard_normal((8, 16, 16)))
    c3 = S3.dwt3d(v, w, 2)
    cl3 = to_pywt(c3)
    assert isinstance(cl3[1], dict) and set(cl3[1]) == {
        "daa", "ada", "dda", "aad", "dad", "add", "ddd"}
    # 'ddd' = all-highpass band = last element of our tuples
    np.testing.assert_array_equal(np.asarray(cl3[2]["ddd"]),
                                  np.asarray(c3.details[0][6]))
    c3b = from_pywt(cl3)
    np.testing.assert_allclose(
        np.asarray(S3.idwt3d(c3b, w, (8, 16, 16))), np.asarray(v),
        atol=1e-10)


def test_interop_errors(rng):
    with pytest.raises(TypeError):
        to_pywt([1, 2, 3])
    with pytest.raises(TypeError):
        from_pywt(np.zeros((4, 4)))
    with pytest.raises(ValueError):
        from_pywt([np.zeros((4, 4))])
    with pytest.raises(ValueError, match="triples"):
        from_pywt([np.zeros((4, 4)), (np.zeros((4, 4)),)])
    with pytest.raises(ValueError, match="missing"):
        from_pywt([np.zeros((4, 4)), {"daa": np.zeros((4, 4))}])
