"""Circular shift and cycle spinning (translation-invariant denoising).

Reference: the circshift kernel (src/common.cu:202-211, 378-396) and the
random-shift logic in Wavelets::forward/inverse (src/wt.cu:242-246, 305).

The reference uses C ``rand()`` for the shifts; here shifts are drawn from
an explicit ``jax.random`` key (or supplied directly), so cycle spinning
is reproducible and jit-friendly: the shift is a traced device scalar, and
``jnp.roll`` handles dynamic shift values without retracing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def circshift2d(x: jnp.ndarray, sr, sc) -> jnp.ndarray:
    """out[y, x] = in[(y - sr) mod Nr, (x - sc) mod Nc]
    (reference: src/common.cu:202-211), over the trailing two axes."""
    return jnp.roll(x, (sr, sc), axis=(-2, -1))


def circshift3d(x: jnp.ndarray, sd, sr, sc) -> jnp.ndarray:
    """3D circular shift over the trailing three axes (no reference
    counterpart — it has no 3D; same mod-N semantics per axis)."""
    return jnp.roll(x, (sd, sr, sc), axis=(-3, -2, -1))


def circshift1d(x: jnp.ndarray, sc) -> jnp.ndarray:
    """1D circular shift along the last axis; the row shift is forced to 0
    for 1D data (reference: src/common.cu:386)."""
    return jnp.roll(x, sc, axis=-1)


def random_shift(key: jax.Array, shape: Tuple[int, int]):
    """Draw (sr, sc) uniformly in [0, Nr) x [0, Nc)
    (reference: src/wt.cu:243-244 uses rand() % N)."""
    kr, kc = jax.random.split(key)
    sr = jax.random.randint(kr, (), 0, shape[0])
    sc = jax.random.randint(kc, (), 0, shape[1])
    return sr, sc
