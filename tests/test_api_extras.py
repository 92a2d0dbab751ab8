"""Stateful Starlet / DualTree facades (api_extras.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu import DualTree, Starlet


def test_starlet_facade_roundtrip_and_denoise(rng):
    img = rng.standard_normal((32, 32)).astype(np.float32)
    S = Starlet(img, levels=3)
    c = S.forward()
    assert len(c.details) == 3
    rec = S.inverse()
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-5)
    den = S.denoise(k=3.0)
    assert den.shape == img.shape
    # jit cache: second call reuses the compiled program (same key)
    assert S._jitted(S._key("fwd"), lambda: None) is not None
    with pytest.raises(ValueError):
        Starlet(img, levels=0)
    with pytest.raises(ValueError):
        Starlet(img, gen=3)


def test_starlet_facade_1d_and_coeffs_guard(rng):
    x = rng.standard_normal(64).astype(np.float32)
    S = Starlet(x, levels=2, ndim=1, gen=1)
    with pytest.raises(ValueError):
        S.inverse()  # forward() not run
    S.forward()
    np.testing.assert_allclose(np.asarray(S.inverse()), x, atol=1e-5)


def test_dualtree_facade_roundtrip_magnitudes_denoise(rng):
    img = rng.standard_normal((64, 64)).astype(np.float32)
    D = DualTree(img, levels=3)
    c = D.forward()
    assert len(c.details) == 3
    assert c.details[0].shape[-3] == 6  # 6 oriented bands
    mags = D.magnitudes()
    assert all(np.iscomplexobj(np.asarray(m)) is False for m in mags)
    rec = D.inverse()
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-4)
    den = D.denoise()
    assert den.shape == img.shape
    with pytest.raises(ValueError):
        DualTree(rng.standard_normal((2, 8, 8)))
