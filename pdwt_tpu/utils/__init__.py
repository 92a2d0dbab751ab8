from .io import read_dat, write_dat

__all__ = ["read_dat", "write_dat"]
