from .cfg import build_cfg_tensors
from .invert import inversion_forward_process, inversion_reverse_process
from .ddim import ddim_inversion_loop, ddim_generation_loop
from .pc_drift import (
    forward_directional,
    get_eigenvectors,
    apply_drift,
    PCStreamChoice,
)
from .sdedit import sdedit_loop, sdedit_loop_cosine
from .solvers import CosineDPMSolver, DDIMSolver, as_solver
from .generate import (
    generation_loop,
    inpaint_latents,
    style_transfer_latents,
    text_to_audio_latents,
)

__all__ = [
    "sdedit_loop_cosine",
    "CosineDPMSolver",
    "DDIMSolver",
    "as_solver",
    "generation_loop",
    "inpaint_latents",
    "style_transfer_latents",
    "text_to_audio_latents",
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
