from .cfg import build_cfg_tensors
from .invert import inversion_forward_process, inversion_reverse_process
from .ddim import ddim_inversion_loop, ddim_generation_loop
from .pc_drift import (
    forward_directional,
    get_eigenvectors,
    apply_drift,
    PCStreamChoice,
)
from .sdedit import sdedit_loop

__all__ = [
    "build_cfg_tensors",
    "inversion_forward_process",
    "inversion_reverse_process",
    "ddim_inversion_loop",
    "ddim_generation_loop",
    "forward_directional",
    "get_eigenvectors",
    "apply_drift",
    "PCStreamChoice",
    "sdedit_loop",
]
