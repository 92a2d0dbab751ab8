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


# ---------------------------------------------------------------------------
# One-call pywt-compatible API (round 5): wavedec/waverec family with
# pywt's signatures, defaults (mode='symmetric') and container formats
# ---------------------------------------------------------------------------

def test_wavedec_waverec_1d_defaults(rng):
    from pdwt_tpu.utils import dwt_max_level, wavedec, waverec

    x = rng.standard_normal(103).astype(np.float64)
    cl = wavedec(x, "db3", level=3)  # pywt default mode='symmetric'
    assert len(cl) == 4
    # pywt size rule per level
    n, F = 103, 6
    for d in reversed(cl[1:]):
        n = (n + F - 1) // 2
        assert d.shape[-1] == n
    y = np.asarray(waverec(cl, "db3"))
    # full inverse length >= original (odd input -> +1); slice like pywt
    assert y.shape[-1] in (103, 104)
    np.testing.assert_allclose(y[:103], x, atol=1e-10)
    assert dwt_max_level(103, 6) == dwt_max_level(103, "db3")


def test_wavedec2_waverecn_roundtrips(rng):
    from pdwt_tpu.utils import (wavedec2, wavedecn, waverec2, waverecn)

    img = rng.standard_normal((2, 45, 38))  # leading batch axis
    cl = wavedec2(img, "sym4", mode="reflect", level=2)
    assert isinstance(cl[1], tuple) and len(cl[1]) == 3
    y = np.asarray(waverec2(cl, "sym4", mode="reflect"))
    np.testing.assert_allclose(y[..., :45, :38], img, atol=1e-9)

    vol = rng.standard_normal((13, 10, 11))
    cn = wavedecn(vol, "db2", mode="zero", level=2)
    assert set(cn[1].keys()) == set("daa ada dda aad dad add ddd".split())
    yv = np.asarray(waverecn(cn, "db2", mode="zero"))
    np.testing.assert_allclose(yv[:13, :10, :11], vol, atol=1e-9)


def test_wavedec_periodization_and_level0(rng):
    from pdwt_tpu.utils import wavedec, waverec

    x = rng.standard_normal(64)
    cl = wavedec(x, "db7", mode="periodization", level=None)  # auto depth
    y = np.asarray(waverec(cl, "db7", mode="periodization"))
    np.testing.assert_allclose(y[:64], x, atol=1e-10)
    assert len(wavedec(x, "db7", level=0)) == 1
    with pytest.raises(ValueError):
        wavedec(x, "db7", level=-1)


def test_waverec_corrupt_list_raises(rng):
    from pdwt_tpu.utils import wavedec, waverec

    x = rng.standard_normal(64)
    cl = wavedec(x, "db3", level=2)
    cl[1] = cl[1][..., :-3]  # truncate a detail band
    with pytest.raises(ValueError):
        waverec(cl, "db3")


def test_single_level_dwt_idwt(rng):
    from pdwt_tpu.utils import dwt, dwt2, idwt, idwt2

    x = rng.standard_normal(50)
    cA, cD = dwt(x, "db2")
    y = np.asarray(idwt(cA, cD, "db2"))
    np.testing.assert_allclose(y[:50], x, atol=1e-10)
    # None branches (pywt semantics: missing branch = zeros)
    approx_only = np.asarray(idwt(cA, None, "db2"))
    detail_only = np.asarray(idwt(None, cD, "db2"))
    np.testing.assert_allclose(approx_only + detail_only, y, atol=1e-10)

    img = rng.standard_normal((31, 27))
    cA2, hvd = dwt2(img, "sym4", mode="reflect")
    y2 = np.asarray(idwt2((cA2, hvd), "sym4", mode="reflect"))
    np.testing.assert_allclose(y2[:31, :27], img, atol=1e-9)
    smooth = np.asarray(idwt2((cA2, (None, None, None)), "sym4",
                              mode="reflect"))
    assert smooth.shape == y2.shape
    with pytest.raises(ValueError):
        idwt(None, None, "db2")


def test_swt_drop_ins(rng):
    from pdwt_tpu.utils import iswt, iswt2, swt, swt2

    x = rng.standard_normal(64)
    cl = swt(x, "db2", 3)
    assert len(cl) == 3 and cl[0][0].shape == (64,)
    np.testing.assert_allclose(np.asarray(iswt(cl, "db2")), x, atol=1e-10)

    img = rng.standard_normal((32, 32))
    c2 = swt2(img, "sym4", 2)
    assert len(c2) == 2 and len(c2[0][1]) == 3
    np.testing.assert_allclose(np.asarray(iswt2(c2, "sym4")), img,
                               atol=1e-9)
    # coarsest-first ordering: level-n approx is smoother than level-1
    tv = lambda a: float(np.abs(np.diff(np.asarray(a), axis=-1)).mean())
    assert tv(c2[0][0]) < tv(c2[-1][0])
