"""Regression tests for backend auto-selection (round-1 VERDICT item 5:
the PDWT_TPU_BACKEND override used to be silently ignored on TPU)."""
import numpy as np
import pytest

from pdwt_tpu.core import conv
from pdwt_tpu.core import separable as sep
from pdwt_tpu.filters import get_wavelet


@pytest.fixture(autouse=True)
def _restore_default_backend():
    prev = conv._default_backend
    yield
    conv.set_default_backend(prev)


def test_default_backend_override_reaches_transforms(monkeypatch):
    calls = []
    orig = conv.analysis_pass

    def spy(*a, **k):
        calls.append(k.get("backend"))
        return orig(*a, **k)

    monkeypatch.setattr(conv, "analysis_pass", spy)
    conv.set_default_backend("gather")
    w = get_wavelet("db2")
    x = np.random.default_rng(0).standard_normal((16, 16))
    sep.dwt2d(x, w, 1)  # backend=None must resolve to the override
    assert calls and all(b == "gather" for b in calls)


def test_env_var_seeds_default_backend(monkeypatch):
    # conv reads the env var at import; the setter is the runtime
    # equivalent — both feed the same _default_backend consulted by
    # separable._auto_backend.
    conv.set_default_backend("fma")
    assert sep._auto_backend(None, None) == "fma"
    conv.set_default_backend(None)


def test_pallas_override_accepted_and_mapped():
    conv.set_default_backend("pallas")
    # top-level transforms honor it...
    assert sep._auto_backend(None, None) == "pallas"
    # ...but the conv passes themselves fall back to a real conv backend
    assert conv.get_default_backend() in ("fma", "xla", "gather")
    # distributed pad_fn calls cannot run the single-chip pallas path
    assert sep._auto_backend(None, object()) is None


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        conv.set_default_backend("cuda")


def test_explicit_kwarg_beats_override():
    conv.set_default_backend("gather")
    assert sep._auto_backend("fma", None) == "fma"
