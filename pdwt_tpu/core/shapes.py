"""Size bookkeeping for decimated transforms.

The reference rounds odd sizes *up* when subsampling (reference:
src/utils.cu:23-27 ``w_div2``) and clamps the decomposition depth to
``ilog2(N / (hlen-1))`` (reference: src/wt.cu:155-165).
"""
from __future__ import annotations

import math
from typing import List, Tuple


def div2(n: int) -> int:
    """Subsampled size; odd sizes round up (reference: src/utils.cu:23-27)."""
    return (n + 1) // 2


def ilog2(n: int) -> int:
    """floor(log2(n)) for n >= 1, 0 otherwise (reference: src/utils.cu:14-20)."""
    return n.bit_length() - 1 if n >= 1 else 0


def max_level(min_dim: int, hlen: int) -> int:
    """Maximum decomposition depth (reference: src/wt.cu:159)."""
    return ilog2(min_dim // (hlen - 1)) if hlen > 1 else ilog2(min_dim)


def level_sizes(n: int, levels: int) -> List[int]:
    """[n, div2(n), div2(div2(n)), ...] — length levels+1.

    Mirrors the size tables built by the reference inverse drivers
    (reference: src/separable.cu:335-342).
    """
    sizes = [n]
    for _ in range(levels):
        sizes.append(div2(sizes[-1]))
    return sizes


def coeff_shapes_2d(
    nr: int, nc: int, levels: int, do_swt: bool
) -> Tuple[Tuple[int, int], List[Tuple[int, int]]]:
    """(approx_shape, [detail_shape per level 1..levels]).

    DWT halves per level with round-up; SWT keeps the full size
    (reference: src/common.cu:400-445).
    """
    if do_swt:
        return (nr, nc), [(nr, nc)] * levels
    rows = level_sizes(nr, levels)
    cols = level_sizes(nc, levels)
    details = [(rows[i + 1], cols[i + 1]) for i in range(levels)]
    return details[-1], details


def coeff_shapes_3d(
    nd: int, nr: int, nc: int, levels: int, do_swt: bool
) -> Tuple[Tuple[int, int, int], List[Tuple[int, int, int]]]:
    """3D analogue of :func:`coeff_shapes_2d` (the reference has no 3D;
    the per-axis size rule is the same w_div2)."""
    if do_swt:
        return (nd, nr, nc), [(nd, nr, nc)] * levels
    deps = level_sizes(nd, levels)
    rows = level_sizes(nr, levels)
    cols = level_sizes(nc, levels)
    details = [(deps[i + 1], rows[i + 1], cols[i + 1]) for i in range(levels)]
    return details[-1], details


def coeff_shapes_1d(n: int, levels: int, do_swt: bool) -> Tuple[int, List[int]]:
    if do_swt:
        return n, [n] * levels
    sizes = level_sizes(n, levels)
    return sizes[-1], sizes[1:]
