from .cache import enable_compile_cache
from .checkpoint import load_coeffs, save_coeffs
from .io import read_dat, write_dat
from .debug import assert_finite, checked, validate_coeffs
from .interop import (dwt_max_level, from_pywt, to_pywt, wavedec, wavedec2,
                      wavedecn, waverec, waverec2, waverecn)
from .profiling import device_time, device_time_any, trace

__all__ = ["read_dat", "write_dat", "save_coeffs", "load_coeffs",
           "device_time", "device_time_any", "trace",
           "assert_finite", "checked", "validate_coeffs",
           "to_pywt", "from_pywt", "enable_compile_cache",
           "dwt_max_level", "wavedec", "wavedec2", "wavedecn",
           "waverec", "waverec2", "waverecn"]
