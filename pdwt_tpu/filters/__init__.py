from .bank import (
    Wavelet,
    factor_quads,
    get_wavelet,
    list_wavelets,
    register_wavelet,
    make_custom_wavelet,
    modwt_wavelet,
    quad_filters,
    MAX_FILTER_WIDTH,
)

__all__ = [
    "Wavelet",
    "factor_quads",
    "get_wavelet",
    "list_wavelets",
    "register_wavelet",
    "make_custom_wavelet",
    "modwt_wavelet",
    "quad_filters",
    "MAX_FILTER_WIDTH",
]
