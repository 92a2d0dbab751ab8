from .bank import (
    Wavelet,
    get_wavelet,
    list_wavelets,
    register_wavelet,
    make_custom_wavelet,
    quad_filters,
    MAX_FILTER_WIDTH,
)

__all__ = [
    "Wavelet",
    "get_wavelet",
    "list_wavelets",
    "register_wavelet",
    "make_custom_wavelet",
    "quad_filters",
    "MAX_FILTER_WIDTH",
]
