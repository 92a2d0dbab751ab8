"""Pallas TPU kernels — fused per-level transform passes.

The always-correct jnp backends live in pdwt_tpu.core.conv; these kernels
implement the same index semantics with both separable passes of a level
fused in VMEM (one HBM read of the input, one write per subband), selected
via ``backend="pallas"`` (the default on TPU).
"""
from .separable_pallas import (
    fwd_geometry,
    fwd_level_2d,
    fwd_level_2d_ad,
    fwd_level_2d_padded,
    inv_geometry,
    inv_level_2d,
    inv_level_2d_ad,
    inv_level_2d_padded,
    pallas_supported_fwd,
    pallas_supported_inv,
)
from .swt_pallas import (
    fwd_level_1d,
    fwd_level_1d_ad,
    inv_level_1d,
    inv_level_1d_ad,
    swt_fwd_geometry,
    swt_fwd_level_1d,
    swt_fwd_level_1d_ad,
    swt_fwd_level_2d,
    swt_fwd_level_2d_ad,
    swt_fwd_level_2d_padded,
    swt_inv_geometry,
    swt_inv_level_1d,
    swt_inv_level_1d_ad,
    swt_inv_level_2d,
    swt_inv_level_2d_ad,
    swt_inv_level_2d_padded,
)

__all__ = [
    "fwd_level_2d", "inv_level_2d", "fwd_level_2d_ad", "inv_level_2d_ad",
    "fwd_geometry", "inv_geometry", "fwd_level_2d_padded", "inv_level_2d_padded",
    "pallas_supported_fwd", "pallas_supported_inv",
    "swt_fwd_level_2d", "swt_inv_level_2d",
    "swt_fwd_level_1d", "swt_inv_level_1d",
    "fwd_level_1d", "inv_level_1d",
    "fwd_level_1d_ad", "inv_level_1d_ad",
    "swt_fwd_level_1d_ad", "swt_inv_level_1d_ad",
    "swt_fwd_level_2d_ad", "swt_inv_level_2d_ad",
    "swt_fwd_geometry", "swt_inv_geometry",
    "swt_fwd_level_2d_padded", "swt_inv_level_2d_padded",
]
