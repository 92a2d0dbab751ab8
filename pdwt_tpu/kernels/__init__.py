"""Pallas TPU kernels — fused per-level transform passes.

The always-correct jnp backends live in pdwt_tpu.core.conv; these kernels
implement the same index semantics with both separable passes of a level
fused in VMEM (one HBM read of the input, one write per subband), selected
via ``backend="pallas"`` (the default on TPU).
"""
from .separable_pallas import (
    fwd_geometry,
    fwd_tail_2d,
    fwd_tail_2d_ad,
    inv_tail_2d,
    inv_tail_2d_ad,
    _tail_supported as tail_supported,
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
from .matmul_pallas import (
    _pick_mxu_tiles as mxu_tiles,
    fwd_level_2d_mxu,
    fwd_level_2d_mxu_ad,
    inv_level_2d_mxu,
    inv_level_2d_mxu_ad,
)
from .mxu1d_pallas import (
    fwd_level_1d_mxu,
    fwd_level_1d_mxu_ad,
    inv_level_1d_mxu,
    inv_level_1d_mxu_ad,
    swt_fwd_level_1d_mxu,
    swt_fwd_level_1d_mxu_ad,
    swt_inv_level_1d_mxu,
    swt_inv_level_1d_mxu_ad,
)
from .ns_matmul_pallas import (
    ns_fwd_level_2d_mxu,
    ns_inv_level_2d_mxu,
    ns_swt_fwd_level_2d_mxu,
    ns_swt_inv_level_2d_mxu,
)
from .swt_matmul_pallas import (
    swt_fwd_level_2d_mxu,
    swt_fwd_level_2d_mxu_ad,
    swt_inv_level_2d_mxu,
    swt_inv_level_2d_mxu_ad,
    swt_inv_level_2d_mxu_denoise_ad,
)
from .swt_pallas import (
    fwd1d_geometry,
    fwd_level_1d,
    fwd_level_1d_padded,
    inv1d_geometry,
    inv_level_1d_padded,
    swt1d_fwd_geometry,
    swt1d_inv_geometry,
    swt_fwd_level_1d_padded,
    swt_inv_level_1d_padded,
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
    swt_inv_level_2d_denoise_ad,
    swt_inv_level_2d_padded,
)

__all__ = [
    "fwd_level_2d", "inv_level_2d", "fwd_level_2d_ad", "inv_level_2d_ad",
    "fwd_geometry", "inv_geometry", "fwd_level_2d_padded", "inv_level_2d_padded",
    "pallas_supported_fwd", "pallas_supported_inv",
    "fwd_tail_2d", "inv_tail_2d", "fwd_tail_2d_ad", "inv_tail_2d_ad",
    "tail_supported",
    "fwd_level_2d_mxu", "inv_level_2d_mxu", "mxu_tiles",
    "fwd_level_2d_mxu_ad", "inv_level_2d_mxu_ad",
    "swt_fwd_level_2d", "swt_inv_level_2d",
    "swt_fwd_level_1d", "swt_inv_level_1d",
    "fwd_level_1d", "inv_level_1d",
    "fwd_level_1d_ad", "inv_level_1d_ad",
    "swt_fwd_level_1d_ad", "swt_inv_level_1d_ad",
    "swt_fwd_level_2d_ad", "swt_inv_level_2d_ad",
    "swt_inv_level_2d_denoise_ad",
    "swt_fwd_level_2d_mxu", "swt_inv_level_2d_mxu",
    "swt_fwd_level_2d_mxu_ad", "swt_inv_level_2d_mxu_ad",
    "swt_inv_level_2d_mxu_denoise_ad",
    "ns_fwd_level_2d_mxu", "ns_inv_level_2d_mxu",
    "ns_swt_fwd_level_2d_mxu", "ns_swt_inv_level_2d_mxu",
    "fwd_level_1d_mxu", "inv_level_1d_mxu",
    "fwd_level_1d_mxu_ad", "inv_level_1d_mxu_ad",
    "swt_fwd_level_1d_mxu", "swt_inv_level_1d_mxu",
    "swt_fwd_level_1d_mxu_ad", "swt_inv_level_1d_mxu_ad",
    "swt_fwd_geometry", "swt_inv_geometry",
    "swt_fwd_level_2d_padded", "swt_inv_level_2d_padded",
    "fwd1d_geometry", "fwd_level_1d_padded",
    "inv1d_geometry", "inv_level_1d_padded",
    "swt1d_fwd_geometry", "swt_fwd_level_1d_padded",
    "swt1d_inv_geometry", "swt_inv_level_1d_padded",
]
