import numpy as np
import pytest

from pdwt_tpu.filters import (
    MAX_FILTER_WIDTH,
    Wavelet,
    get_wavelet,
    list_wavelets,
    make_custom_wavelet,
    quad_filters,
    register_wavelet,
)

ORTHOGONAL_FAMILIES = ("db", "sym", "coif", "haar")


def test_bank_has_72_wavelets():
    names = [n for n in list_wavelets()
             if n not in ("db1", "bior1.1", "rbio1.1", "rbior1.1")]
    assert len(names) == 72


def test_case_insensitive_lookup():
    assert get_wavelet("DB7") == get_wavelet("db7")
    assert get_wavelet("Bior4.4") == get_wavelet("bior4.4")


def test_haar_aliases():
    h = get_wavelet("haar")
    for alias in ("db1", "bior1.1", "rbio1.1", "rbior1.1", "HAAR"):
        w = get_wavelet(alias)
        assert np.array_equal(w.dec_lo, h.dec_lo)


def test_unknown_wavelet_raises():
    with pytest.raises(ValueError, match="unknown wavelet"):
        get_wavelet("nope42")


def test_hlen_matches_registry():
    expected = {"db7": 14, "sym8": 16, "coif3": 18, "bior4.4": 10,
                "rbio6.8": 18, "haar": 2, "db20": 40}
    for name, hlen in expected.items():
        assert get_wavelet(name).hlen == hlen


def test_orthogonal_properties():
    for name in list_wavelets():
        if not name.startswith(ORTHOGONAL_FAMILIES):
            continue
        w = get_wavelet(name)
        # published tables carry ~1e-8 precision (coif5), hence the tol
        assert abs(w.dec_lo.sum() - np.sqrt(2)) < 1e-7, name
        assert abs(w.dec_lo @ w.dec_lo - 1.0) < 1e-7, name
        assert np.allclose(w.rec_lo, w.dec_lo[::-1], atol=1e-14), name


def test_biorthogonality_identity():
    # Two-channel PR condition: with P(z) = RecLo(z)DecLo(z) + RecHi(z)DecHi(z),
    # the half-band property P(z) + P(-z) = 2 z^-(hlen-1) must hold, i.e. the
    # product coefficients of the same parity as hlen-1 are 2*delta[hlen-1].
    for name in list_wavelets():
        w = get_wavelet(name)
        p = np.convolve(w.rec_lo, w.dec_lo) + np.convolve(w.rec_hi, w.dec_hi)
        h = w.hlen
        sel = p[(h - 1) % 2::2]
        peak = int(np.argmax(np.abs(sel)))
        assert 2 * peak + (h - 1) % 2 == h - 1, name
        assert abs(sel[peak] - 2.0) < 1e-6, (name, sel[peak])
        rest = np.delete(sel, peak)
        assert rest.size == 0 or np.abs(rest).max() < 1e-6, name


def test_custom_wavelet_roundtrip():
    w = get_wavelet("db4")
    c = make_custom_wavelet("mydb4", w.dec_lo, w.dec_hi, w.rec_lo, w.rec_hi)
    assert c.hlen == 8
    register_wavelet(c)
    assert get_wavelet("MyDB4") == c


@pytest.mark.slow
def test_custom_wavelet_longer_than_reference_cap():
    """Filters beyond the reference's 40-tap constant-memory cap are
    accepted (reference TODO.txt: "Should allow > 40 coeffs") and keep
    perfect reconstruction: a symmetrically zero-padded db20 bank is a
    valid 44-tap PR bank."""
    import jax.numpy as jnp

    from pdwt_tpu.core import separable as sep

    w = get_wavelet("db20")
    pad = lambda f: np.concatenate([np.zeros(2), f, np.zeros(2)])
    big = make_custom_wavelet("big44", pad(w.dec_lo), pad(w.dec_hi),
                              pad(w.rec_lo), pad(w.rec_hi))
    assert big.hlen == 44 > MAX_FILTER_WIDTH
    x = jnp.asarray(np.random.default_rng(3).standard_normal((64, 64)))
    for bk in ("fma", "gather"):
        y = sep.idwt2d(sep.dwt2d(x, big, 2, backend=bk), big, (64, 64),
                       backend=bk)
        assert float(abs(y - x).max()) < 1e-9


def test_quad_filters_outer_products():
    w = get_wavelet("db2")
    q = quad_filters(w.dec_lo, w.dec_hi)
    assert q.shape == (4, 4, 4)
    assert np.allclose(q[0], np.outer(w.dec_lo, w.dec_lo))
    # default convention: H (index 1) is highpass along rows
    assert np.allclose(q[1], np.outer(w.dec_hi, w.dec_lo))
    # reference non-separable convention swaps H/V
    qr = quad_filters(w.dec_lo, w.dec_hi, transpose_detail_convention=True)
    assert np.allclose(qr[1], q[2]) and np.allclose(qr[2], q[1])
