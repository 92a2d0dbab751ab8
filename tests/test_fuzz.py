"""Seeded randomized property sweep: perfect reconstruction across
random (ndim, shape, wavelet, levels, backend) combinations — the
regression net for edge-case interactions (odd sizes x deep levels x
long filters x backends) that targeted tests never enumerate."""
import jax.numpy as jnp
import numpy as np
import pytest

from pdwt_tpu.core import separable as S
from pdwt_tpu.core import separable3d as S3
from pdwt_tpu.core import anisotropic as A
from pdwt_tpu.core.shapes import max_level
from pdwt_tpu.filters import get_wavelet

_WAVS = ["haar", "db2", "db7", "db16", "sym5", "coif3", "bior2.6",
         "rbio3.3", "bior6.8"]
_BACKENDS = ["fma", "xla", "gather"]


@pytest.mark.slow
def test_fuzz_roundtrips():
    rng = np.random.default_rng(20260818)
    for trial in range(30):
        ndim = int(rng.integers(1, 4))
        wname = _WAVS[int(rng.integers(len(_WAVS)))]
        w = get_wavelet(wname)
        backend = _BACKENDS[int(rng.integers(len(_BACKENDS)))]
        swt = bool(rng.integers(2))
        if ndim == 1:
            shape = (int(rng.integers(1, 4)),
                     int(rng.integers(w.hlen, 300)))
        elif ndim == 2:
            shape = tuple(int(rng.integers(w.hlen, max(120, w.hlen + 8)))
                          for _ in range(2))
        else:
            lo = w.hlen
            shape = (int(rng.integers(lo, max(24, lo + 8))),
                     int(rng.integers(lo, max(48, lo + 8))),
                     int(rng.integers(lo, max(48, lo + 8))))
        lmax = max(1, min(max_level(min(shape[-min(ndim, len(shape)):]),
                                    w.hlen), 4))
        levels = int(rng.integers(1, lmax + 1))
        x = jnp.asarray(rng.standard_normal(shape))
        tag = (trial, ndim, wname, shape, levels, backend, swt)
        if ndim == 1:
            fwd = S.swt1d if swt else S.dwt1d
            c = fwd(x, w, levels, backend=backend)
            y = (S.iswt1d(c, w, backend=backend) if swt
                 else S.idwt1d(c, w, shape[-1], backend=backend))
        elif ndim == 2:
            fwd = S.swt2d if swt else S.dwt2d
            c = fwd(x, w, levels, backend=backend)
            y = (S.iswt2d(c, w, backend=backend) if swt
                 else S.idwt2d(c, w, shape, backend=backend))
        else:
            fwd = S3.swt3d if swt else S3.dwt3d
            c = fwd(x, w, levels, backend=backend)
            y = (S3.iswt3d(c, w, backend=backend) if swt
                 else S3.idwt3d(c, w, shape, backend=backend))
        err = float(jnp.abs(y - x).max())
        assert err < 1e-7, (tag, err)

    # anisotropic: random per-axis levels
    for trial in range(8):
        w = get_wavelet(_WAVS[int(rng.integers(len(_WAVS)))])
        shape = tuple(int(rng.integers(max(w.hlen, 8), 64))
                      for _ in range(2))
        lv = tuple(int(rng.integers(0, 3)) for _ in range(2))
        x = jnp.asarray(rng.standard_normal(shape))
        y = A.fs_idwt(A.fs_dwt(x, w, lv), w, shape, lv)
        assert float(jnp.abs(y - x).max()) < 1e-8, (trial, shape, lv)
