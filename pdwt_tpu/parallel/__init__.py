"""Multi-chip parallelism: meshes, ring halo exchange, sharded transforms.

New capability relative to the single-GPU reference (reference:
README.md:34); see SURVEY.md §2.2/2.3 for the strategy mapping.
"""
from . import packets
from .anisotropic import fs_dwt, fs_idwt
from .isotropic import istarlet, starlet
from .halo import make_pad_fn, ring_wrap_pad
from .mesh import init_distributed, make_mesh
from .sharded import (
    dwt1d,
    dwt2d,
    dwt2d_ns,
    dwt3d,
    idwt1d,
    idwt2d,
    idwt2d_ns,
    idwt3d,
    iswt1d,
    iswt2d,
    iswt3d,
    shard_image,
    iswt2d_ns,
    swt1d,
    swt2d,
    swt2d_ns,
    swt3d,
)

__all__ = [
    "make_mesh", "init_distributed", "make_pad_fn", "ring_wrap_pad", "shard_image",
    "dwt1d", "dwt2d", "idwt1d", "idwt2d",
    "dwt3d", "idwt3d", "swt3d", "iswt3d",
    "swt1d", "swt2d", "iswt1d", "iswt2d",
    "dwt2d_ns", "idwt2d_ns", "swt2d_ns", "iswt2d_ns",
    "fs_dwt", "fs_idwt", "packets", "starlet", "istarlet",
]
