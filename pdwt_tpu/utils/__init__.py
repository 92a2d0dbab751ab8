from .cache import enable_compile_cache
from .checkpoint import load_coeffs, save_coeffs
from .io import read_dat, write_dat
from .debug import assert_finite, checked, validate_coeffs
from .interop import (dwt, dwt2, dwt_max_level, from_pywt, idwt, idwt2,
                      swt, swt2, iswt, iswt2, to_pywt, wavedec,
                      wavedec2, wavedecn, waverec, waverec2, waverecn)
from .profiling import device_time, device_time_any, trace

__all__ = ["read_dat", "write_dat", "save_coeffs", "load_coeffs",
           "device_time", "device_time_any", "trace",
           "assert_finite", "checked", "validate_coeffs",
           "to_pywt", "from_pywt", "enable_compile_cache",
           "dwt_max_level", "dwt", "idwt", "dwt2", "idwt2",
           "wavedec", "wavedec2", "wavedecn", "swt", "iswt", "swt2", "iswt2",
           "waverec", "waverec2", "waverecn"]
