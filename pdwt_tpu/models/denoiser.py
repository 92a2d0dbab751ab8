"""Translation-invariant wavelet denoising — the flagship pipeline.

This is the application the reference library exists for: sparse
regularization by thresholding wavelet coefficients, with
cycle spinning for translation invariance (reference: src/wt.cu:242-246,
305 — random circshift before forward, opposite shift after inverse;
demo scenario 3, src/demo.cpp:201-205).

The reference draws shifts with C ``rand()`` on the host and mutates
class state; here a single jitted function takes an explicit PRNG key,
and the full pipeline (shift → analysis → threshold → synthesis →
unshift) compiles to one XLA program — including the norm reduction the
reference performs as per-subband cuBLAS calls with host round-trips
(reference: src/wt.cu:398-418).

``cycle_spin_denoise`` averages over many spins with ``lax.scan`` —
full translation-invariant denoising, equivalent to averaging the
reference's per-call random spins over repeated runs.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .. import ops
from ..core import separable as sep_core
from ..filters import Wavelet, get_wavelet


def _resolve(wav) -> Wavelet:
    return get_wavelet(wav) if isinstance(wav, str) else wav


_THRESH = {
    "soft": ops.soft_threshold,
    "hard": ops.hard_threshold,
    "group": ops.group_soft_threshold,
    "garrote": ops.garrote_threshold,
}


def denoise_step(
    img: jnp.ndarray,
    key: Optional[jax.Array],
    wav,
    levels: int,
    beta,
    *,
    swt: bool = False,
    mode: str = "soft",
    normalize: bool = False,
    backend: Optional[str] = None,
    boundary="periodization",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One denoising step: (random shift) → DWT/SWT → threshold → inverse
    → (unshift).  Returns ``(denoised, norm1_of_thresholded_coeffs)``.

    ``key=None`` disables cycle spinning (deterministic step).
    ``boundary`` selects the DWT's boundary extension (core/modes.py;
    ``mode`` here is the THRESHOLD type, following the reference's
    naming) — non-periodization boundaries avoid the periodic wrap's
    edge artifacts on non-periodic images; DWT only, and incompatible
    with cycle spinning (circular shifts mix opposite edges).
    """
    wav = _resolve(wav)
    nr, nc = img.shape[-2:]
    if boundary != "periodization" and (swt or key is not None):
        raise ValueError(
            "boundary modes other than 'periodization' apply to the "
            "decimated DWT without cycle spinning")
    if key is not None:
        kr, kc = jax.random.split(key)
        sr = jax.random.randint(kr, (), 0, nr)
        sc = jax.random.randint(kc, (), 0, nc)
        img = jnp.roll(img, shift=(sr, sc), axis=(-2, -1))
    if swt:
        coeffs = sep_core.swt2d(img, wav, levels, backend=backend)
        if (mode in ("soft", "hard", "garrote")
                and not isinstance(beta, (list, tuple))):
            # fused fast path: the detail threshold happens inside the
            # synthesis kernels' tile reads and the norm is computed
            # from the UN-thresholded coefficients by the identity
            # norm1(soft(x, b)) = sum max(|x|-b, 0) — the thresholded
            # pytree never touches HBM.
            n1 = ops.thresholded_norm1(coeffs, beta, mode=mode,
                                       normalize=normalize)
            out = sep_core.iswt2d_denoise(coeffs, wav, beta, mode=mode,
                                          normalize=normalize,
                                          backend=backend)
        else:
            coeffs = _THRESH[mode](coeffs, beta, normalize=normalize)
            n1 = ops.norm1(coeffs)
            out = sep_core.iswt2d(coeffs, wav, backend=backend)
    else:
        coeffs = sep_core.dwt2d(img, wav, levels, backend=backend,
                                mode=boundary)
        coeffs = _THRESH[mode](coeffs, beta, normalize=normalize)
        n1 = ops.norm1(coeffs)
        out = sep_core.idwt2d(coeffs, wav, (nr, nc), backend=backend,
                              mode=boundary)
    if key is not None:
        out = jnp.roll(out, shift=(-sr, -sc), axis=(-2, -1))
    return out, n1


def _auto_betas(coeffs, method: str):
    """Data-driven thresholds for auto_denoise/auto_denoise_3d: a
    per-level/per-band list (bayes / sure) or a traced scalar
    (universal)."""
    if method == "bayes":
        return list(ops.bayes_thresholds(coeffs))
    if method == "sure":
        return list(ops.sure_thresholds(coeffs))
    if method == "universal":
        return ops.universal_threshold(coeffs)
    raise ValueError(f"unknown method {method!r}")


def auto_denoise(
    img: jnp.ndarray,
    wav,
    levels: int,
    *,
    method: str = "bayes",
    mode: str = "soft",
    swt: bool = False,
    backend: Optional[str] = None,
    boundary="periodization",
) -> jnp.ndarray:
    """Fully data-driven 2D denoise: estimate the noise level and the
    thresholds from the coefficients themselves, threshold, invert — one
    jitted program, no tuning knob.  ``method`` is ``"bayes"``
    (BayesShrink per-band thresholds), ``"sure"`` (hybrid SureShrink),
    or ``"universal"`` (VisuShrink σ·sqrt(2 ln N)).  The reference
    leaves β to the user (its demo hard-codes 10.0, reference:
    src/demo.cpp:38).  ``boundary`` = DWT boundary extension
    (core/modes.py; DWT only — avoids periodic edge artifacts)."""
    wav = _resolve(wav)
    nr, nc = img.shape[-2:]
    if boundary != "periodization" and swt:
        raise ValueError("boundary modes apply to the decimated DWT only")
    fwd = sep_core.swt2d if swt else sep_core.dwt2d
    fkw = {} if swt else {"mode": boundary}
    coeffs = fwd(img, wav, levels, backend=backend, **fkw)
    beta = _auto_betas(coeffs, method)
    if (swt and mode in ("soft", "hard", "garrote")
            and not isinstance(beta, list)):
        return sep_core.iswt2d_denoise(coeffs, wav, beta, mode=mode,
                                       backend=backend)
    coeffs = _THRESH[mode](coeffs, beta)
    if swt:
        return sep_core.iswt2d(coeffs, wav, backend=backend)
    return sep_core.idwt2d(coeffs, wav, (nr, nc), backend=backend,
                           mode=boundary)


def auto_denoise_3d(
    vol: jnp.ndarray,
    wav,
    levels: int,
    *,
    method: str = "bayes",
    mode: str = "soft",
    swt: bool = False,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Volume analogue of :func:`auto_denoise`: estimate the noise from
    the finest all-highpass (ddd) band and threshold per band (bayes /
    sure) or globally (universal), one jitted program."""
    from ..core import separable3d as sep3

    wav = _resolve(wav)
    nd, nr, nc = vol.shape[-3:]
    fwd = sep3.swt3d if swt else sep3.dwt3d
    coeffs = fwd(vol, wav, levels, backend=backend)
    beta = _auto_betas(coeffs, method)
    coeffs = _THRESH[mode](coeffs, beta)
    if swt:
        return sep3.iswt3d(coeffs, wav, backend=backend)
    return sep3.idwt3d(coeffs, wav, (nd, nr, nc), backend=backend)


def starlet_auto_denoise(
    x: jnp.ndarray,
    levels: int,
    *,
    k: float = 3.0,
    ndim: int = 2,
    gen: int = 2,
    mode: str = "soft",
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Knob-free starlet denoise (Starck's k-sigma rule): the white-noise
    sigma is MAD-estimated from the finest detail plane divided by its
    exact per-scale gain (core.starlet.starlet_noise_gains — the
    sigma_j table computed, not tabulated), and every plane is
    thresholded at ``k * sigma * gain_j`` before the exact gen-1/2
    reconstruction.  ``k`` is a scalar or a per-level sequence
    (finest first; astronomy practice often raises the finest to 4)."""
    from ..core.starlet import (StarletCoeffs, istarlet, starlet,
                                starlet_noise_gains)
    from ..ops.threshold import THR_ELEM

    thr = THR_ELEM[mode]
    c = starlet(x, levels, ndim=ndim, gen=gen, backend=backend)
    gains = starlet_noise_gains(levels, ndim, gen)
    ks = list(k) if isinstance(k, (list, tuple)) else [k] * levels
    if len(ks) != levels:
        raise ValueError(f"need {levels} k values, got {len(ks)}")
    w1 = c.details[0]
    sigma = jnp.median(jnp.abs(w1)) / 0.6745 / gains[0]
    details = tuple(thr(w, kj * sigma * g)
                    for w, kj, g in zip(c.details, ks, gains))
    return istarlet(StarletCoeffs(c.approx, details), ndim=ndim,
                    gen=gen, backend=backend)


def packet_denoise(
    img: jnp.ndarray,
    wav,
    levels: int,
    beta=None,
    *,
    cost: str = "shannon",
    mode: str = "soft",
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Best-basis wavelet-packet denoise: decompose to a full packet
    tree, pick the Coifman-Wickerhauser best basis, threshold every
    detail leaf (the pure approximation chain, node 0 of its depth, is
    kept), reconstruct.  ``beta=None`` picks the VisuShrink universal
    threshold from the depth-1 diagonal node's MAD noise estimate.
    The basis search needs concrete coefficients, so this runs the
    decomposition eagerly and jits the (static-basis) thresholded
    reconstruction — wrap in jit only the pieces yourself if you reuse
    one basis across frames."""
    import math as _math

    from ..core import packets as pk_mod
    from ..ops.estimate import _MAD_TO_SIGMA
    from ..ops.threshold import THR_ELEM

    wav = _resolve(wav)
    thr = THR_ELEM[mode]
    pk = pk_mod.wp2d(img, wav, levels, backend=backend)
    if beta is None:
        d1 = pk.nodes[1][..., 3, :, :].astype(jnp.float32)
        sigma = jnp.median(jnp.abs(d1)) * jnp.float32(_MAD_TO_SIGMA)
        beta = sigma * jnp.float32(_math.sqrt(2.0 * _math.log(
            img.shape[-2] * img.shape[-1])))
    leaves, _ = pk_mod.best_basis(pk, cost)

    def mfn(v, j, i):
        return v if i == 0 else thr(v, beta)

    return jax.jit(
        lambda p: pk_mod.wp_reconstruct(p, leaves, wav, map_fn=mfn,
                                        backend=backend))(pk)


def cycle_spin_denoise(
    img: jnp.ndarray,
    key: jax.Array,
    wav,
    levels: int,
    beta,
    *,
    spins: int = 8,
    mode: str = "soft",
    normalize: bool = False,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Average ``spins`` randomly-shifted denoise steps (TI denoising)."""
    wav = _resolve(wav)
    keys = jax.random.split(key, spins)

    def body(acc, k):
        out, _ = denoise_step(img, k, wav, levels, beta, mode=mode,
                              normalize=normalize, backend=backend)
        return acc + out, None

    acc, _ = lax.scan(body, jnp.zeros_like(img), keys)
    return acc / spins


def sharded_denoise_step(
    img: jnp.ndarray,
    wav,
    levels: int,
    beta,
    mesh,
    *,
    data_axis: Optional[str] = None,
    row_axis: Optional[str] = None,
    col_axis: Optional[str] = None,
    mode: str = "soft",
    swt: bool = False,
    backend: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed denoise step over a (data, row, col) mesh.

    The analysis/synthesis run under shard_map with ring halo exchange;
    the threshold is elementwise on the sharded pytree; the norm lowers to
    per-chip partials + all-reduce.  Returns ``(denoised, norm1)``.
    """
    from .. import parallel as par

    wav = _resolve(wav)
    nr, nc = img.shape[-2:]
    axes = dict(data_axis=data_axis, row_axis=row_axis, col_axis=col_axis)
    coeffs = par.dwt2d(img, wav, levels, mesh, swt=swt, backend=backend,
                       **axes)
    coeffs = _THRESH[mode](coeffs, beta)
    n1 = ops.norm1(coeffs)
    out = par.idwt2d(coeffs, wav, (nr, nc), mesh, swt=swt, backend=backend,
                     **axes)
    return out, n1


def sharded_denoise_step_3d(
    vol: jnp.ndarray,
    wav,
    levels: int,
    beta,
    mesh,
    *,
    data_axis: Optional[str] = None,
    dep_axis: Optional[str] = None,
    row_axis: Optional[str] = None,
    col_axis: Optional[str] = None,
    mode: str = "soft",
    swt: bool = False,
    backend: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed 3D denoise step over a (data, depth, row, col) mesh —
    the volume analogue of :func:`sharded_denoise_step` (halos ride all
    three spatial rings).  Returns ``(denoised, norm1)``."""
    from .. import parallel as par

    wav = _resolve(wav)
    nd, nr, nc = vol.shape[-3:]
    axes = dict(data_axis=data_axis, dep_axis=dep_axis, row_axis=row_axis,
                col_axis=col_axis)
    coeffs = par.dwt3d(vol, wav, levels, mesh, swt=swt, backend=backend,
                       **axes)
    coeffs = _THRESH[mode](coeffs, beta)
    n1 = ops.norm1(coeffs)
    out = par.idwt3d(coeffs, wav, (nd, nr, nc), mesh, swt=swt,
                     backend=backend, **axes)
    return out, n1


def denoise_step_3d(
    vol: jnp.ndarray,
    key: Optional[jax.Array],
    wav,
    levels: int,
    beta,
    *,
    swt: bool = False,
    mode: str = "soft",
    normalize: bool = False,
    backend: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3D denoise step (beyond the reference — it has no 3D): (random
    3-axis shift) → DWT/SWT → threshold → norm → inverse → (unshift).
    Returns ``(denoised, norm1_of_thresholded_coeffs)``."""
    from ..core import separable3d as sep3

    wav = _resolve(wav)
    nd, nr, nc = vol.shape[-3:]
    if key is not None:
        kd, kr, kc = jax.random.split(key, 3)
        sd = jax.random.randint(kd, (), 0, nd)
        sr = jax.random.randint(kr, (), 0, nr)
        sc = jax.random.randint(kc, (), 0, nc)
        vol = jnp.roll(vol, shift=(sd, sr, sc), axis=(-3, -2, -1))
    fwd = sep3.swt3d if swt else sep3.dwt3d
    coeffs = fwd(vol, wav, levels, backend=backend)
    if swt and mode in ("soft", "hard", "garrote") and not isinstance(beta,
                                                           (list, tuple)):
        # fused fast path like the 2D step: the detail threshold happens
        # inside the synthesis kernels' tile reads and the norm comes
        # from the UN-thresholded coefficients — the thresholded pytree
        # never touches HBM.
        n1 = ops.thresholded_norm1(coeffs, beta, mode=mode,
                                   normalize=normalize)
        out = sep3.iswt3d_denoise(coeffs, wav, beta, mode=mode,
                                  normalize=normalize, backend=backend)
    elif swt:
        coeffs = _THRESH[mode](coeffs, beta, normalize=normalize)
        n1 = ops.norm1(coeffs)
        out = sep3.iswt3d(coeffs, wav, backend=backend)
    else:
        coeffs = _THRESH[mode](coeffs, beta, normalize=normalize)
        n1 = ops.norm1(coeffs)
        out = sep3.idwt3d(coeffs, wav, (nd, nr, nc), backend=backend)
    if key is not None:
        out = jnp.roll(out, shift=(-sd, -sr, -sc), axis=(-3, -2, -1))
    return out, n1
