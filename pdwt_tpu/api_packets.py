"""Stateful ``WaveletPackets`` facade over the packet engine.

The packet analogue of :class:`pdwt_tpu.Wavelets` (the reference has no
packet transform at all — beyond-reference capability, see
core/packets.py).  Same design rules as the main facade: state is a
pytree on device, every pipeline is jitted once per configuration, and
thresholding is FUSED into the reconstruction's leaf reads (the
thresholded tree is never materialized).

    >>> WP = WaveletPackets(img, wname="db4", levels=3)
    >>> WP.forward()
    >>> leaves, cost = WP.best_basis("shannon")
    >>> den = WP.reconstruct(beta=25.0)          # threshold + synthesize
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import packets as pk_mod
from .filters import Wavelet, get_wavelet
from .ops.threshold import THR_ELEM


class WaveletPackets:
    """Full wavelet-packet tree of a 1D signal / 2D image / 3D volume
    (spatial rank inferred from ``img.ndim``; construct with an extra
    leading axis and ``ndim=`` for batched data)."""

    def __init__(self, img, wname: str = "haar", levels: int = 1, *,
                 ndim: Optional[int] = None, dtype=None,
                 backend: Optional[str] = None):
        img = jnp.asarray(img, dtype)
        self.ndim = int(ndim) if ndim is not None else min(img.ndim, 3)
        if not 1 <= self.ndim <= 3:
            raise ValueError(f"ndim must be 1..3, got {self.ndim}")
        if levels < 1:
            raise ValueError("levels must be >= 1")
        self.wavelet: Wavelet = (get_wavelet(wname)
                                 if isinstance(wname, str) else wname)
        self.levels = int(levels)
        self.backend = backend
        self.d_image = img
        self.packets = None
        self.leaves: Optional[Tuple[Tuple[int, int], ...]] = None
        self._jit = {}

    # -- internals -----------------------------------------------------
    def _fwd_fn(self):
        return {1: pk_mod.wp1d, 2: pk_mod.wp2d, 3: pk_mod.wp3d}[self.ndim]

    def _jitted(self, key, make):
        fn = self._jit.get(key)
        if fn is None:
            fn = jax.jit(make())
            self._jit[key] = fn
        return fn

    def _full_cover(self):
        fan = {1: 2, 2: 4, 3: 8}[self.ndim]
        return tuple((self.levels, i) for i in range(fan ** self.levels))

    # -- pipeline ------------------------------------------------------
    def forward(self):
        """Decompose the image into the full packet tree (one batched
        fused-level call per depth)."""
        fwd = self._fwd_fn()
        self.packets = self._jitted(
            ("fwd", self.d_image.shape, self.d_image.dtype),
            lambda: (lambda x: fwd(x, self.wavelet, self.levels,
                                   backend=self.backend)))(self.d_image)
        self.leaves = None
        return self.packets

    def best_basis(self, cost: str = "shannon", thresh: float = 0.0):
        """Pick and store the Coifman-Wickerhauser best basis; returns
        ``(leaves, total_cost)``."""
        if self.packets is None:
            self.forward()
        self.leaves, total = pk_mod.best_basis(self.packets, cost, thresh)
        return self.leaves, total

    def reconstruct(self, beta=None, mode: str = "soft"):
        """Synthesize from the stored basis (the full tree if
        :meth:`best_basis` was not called).  ``beta`` thresholds every
        detail leaf inside the reconstruction (node 0 of each depth —
        the pure approximation chain — passes through)."""
        if self.packets is None:
            raise ValueError("run forward() first")
        leaves = self.leaves if self.leaves is not None \
            else self._full_cover()
        thr = THR_ELEM[mode]

        def make():
            def fn(pk, b):
                mfn = (None if beta is None
                       else (lambda v, j, i: v if i == 0 else thr(v, b)))
                return pk_mod.wp_reconstruct(pk, leaves, self.wavelet,
                                             map_fn=mfn,
                                             backend=self.backend)
            return fn

        return self._jitted(("rec", leaves, mode, beta is None),
                            make)(self.packets, 0.0 if beta is None
                                  else beta)

    # -- access --------------------------------------------------------
    def get_node(self, depth: int, index: int, copy: bool = True):
        """Coefficients of one tree node (numpy copy, or the on-device
        array with ``copy=False``)."""
        if self.packets is None:
            raise ValueError("run forward() first")
        val = self.packets.nodes[depth][
            (Ellipsis, index) + (slice(None),) * self.ndim]
        return np.asarray(val) if copy else val

    def costs(self, cost: str = "shannon", thresh: float = 0.0):
        """Per-depth per-node additive cost vectors (numpy)."""
        if self.packets is None:
            raise ValueError("run forward() first")
        return [np.asarray(c) for c in
                pk_mod.wp_costs(self.packets, cost, thresh)]

    def __repr__(self):
        basis = (f"{len(self.leaves)}-leaf basis" if self.leaves
                 else "full tree")
        return (f"WaveletPackets({self.wavelet.name}, levels="
                f"{self.levels}, ndim={self.ndim}, "
                f"{'decomposed, ' + basis if self.packets is not None else 'not decomposed'})")
