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


def test_mxu_modes_interpret(monkeypatch, rng):
    """bf16 and mixed MXU kernel paths in pallas interpret mode on CPU —
    keeps the serving-mode kernels covered by the default suite."""
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("PDWT_PALLAS_INTERPRET", "1")
    w = get_wavelet("db7")
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 255, (512, 512)), jnp.float32)
    cg = sep.dwt2d(x, w, 1, backend="gather")

    cb = sep.dwt2d(x.astype(jnp.bfloat16), w, 1, backend="pallas")
    # bf16 mode v2 (round-3): details bf16, approximation chain f32
    assert cb.approx.dtype == jnp.float32
    assert cb.details[0][0].dtype == jnp.bfloat16
    rel = max(float(jnp.abs(a.astype(jnp.float32) - b).max())
              for a, b in zip(jax.tree.leaves(cb), jax.tree.leaves(cg)))
    rel /= float(jnp.abs(cg.approx).max())
    assert rel < 1e-2
    yb = sep.idwt2d(cb, w, (512, 512), backend="pallas")
    assert yb.dtype == jnp.bfloat16
    assert float(jnp.abs(yb.astype(jnp.float32) - x).max()) < 3.0

    monkeypatch.setenv("PDWT_TPU_PRECISION", "mixed")
    cm = sep.dwt2d(x, w, 1, backend="pallas")
    assert cm.approx.dtype == jnp.float32
    rel = max(float(jnp.abs(a - b).max())
              for a, b in zip(jax.tree.leaves(cm), jax.tree.leaves(cg)))
    rel /= float(jnp.abs(cg.approx).max())
    assert rel < 1e-4
    ym = sep.idwt2d(cm, w, (512, 512), backend="pallas")
    assert float(jnp.abs(ym - x).max()) < 1e-2 * 255
