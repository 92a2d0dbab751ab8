"""Application-level models built on the wavelet engine."""
from .denoiser import (auto_denoise, auto_denoise_3d,
                       cycle_spin_denoise, denoise_step,
                       denoise_step_3d, packet_denoise,
                       sharded_denoise_step, sharded_denoise_step_3d,
                       starlet_auto_denoise)
from .solver import ista

__all__ = ["denoise_step", "denoise_step_3d", "cycle_spin_denoise",
           "auto_denoise", "auto_denoise_3d", "packet_denoise",
           "sharded_denoise_step",
           "sharded_denoise_step_3d", "ista",
           "starlet_auto_denoise"]
