"""Image-editing CLIs: SDEdit, PC extraction and PC drift application on
Stable Diffusion v1.4 / CelebA-HQ LDM.

Flag-compatible with the reference's code/images_run_sdedit.py,
code/images_pc_extract_inv.py and code/images_pc_apply_drift.py — the same
three algorithms the audio CLIs run, driving the image model specs through
the identical editing core (SURVEY.md §2.1 "Image CLIs" row).
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..editing.sdedit import sdedit_loop
from ..models.registry import load_model
from ..utils.image_io import load_image, save_image
from .common import dump_run_summary, init_wandb, set_reproducibility
from .pc_apply import build_parser as pc_apply_parser, run_pc_application
from .pc_extract import run_pc_extraction
from ..editing.pcdata import load_extraction

IMAGE_MODEL_CHOICES = [
    "CompVis/stable-diffusion-v1-4",
    "CompVis/ldm-celebahq-256",
    "test/tiny-sd",
    "test/tiny-celebahq",
]


def _resize_for(model_id, resize):
    if resize is not None:
        return tuple(resize)
    return (256, 256) if "celebahq" in model_id else (512, 512)


# --------------------------------------------------------------- sdedit
def sdedit_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SDEdit on images")
    p.add_argument("--device_num", type=int, default=0)
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--model_id", type=str, choices=IMAGE_MODEL_CHOICES,
                   default="CompVis/stable-diffusion-v1-4")
    p.add_argument("--init_im", type=str, required=True)
    p.add_argument("--cfg_tar", type=float, default=12)
    p.add_argument("--num_diffusion_steps", type=int, default=100)
    p.add_argument("--target_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--target_neg_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--results_path", default="sdedit")
    p.add_argument("--tstart", type=int, default=50)
    p.add_argument("-r", "--resize", nargs=2, type=int, default=None)
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--wandb_name", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    p.add_argument("--wandb_disable", action="store_true")
    return p


def sdedit_main(argv=None):
    args = sdedit_parser().parse_args(argv)
    args.eta = 1.0
    if not os.path.exists(args.init_im):
        raise FileNotFoundError(f"--init_im: no such file: {args.init_im}")
    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)
    skip = args.num_diffusion_steps - args.tstart
    image_name = f"s{args.seed}_skip{skip}_cfg{args.cfg_tar}"
    wandb = init_wandb(args, "sdedit_images", image_name)
    if args.weights_dir is None:
        warnings.warn("--weights_dir not given: running with RANDOM weights.")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = load_model(args.model_id, args.num_diffusion_steps,
                      weights_dir=args.weights_dir, dtype=dtype)
    x0 = jnp.asarray(load_image(args.init_im, resize=_resize_for(args.model_id, args.resize)))
    w0 = pipe.vae_encode(x0)

    uncond = pipe.encode_text(args.target_neg_prompt, negative=True)
    tgt = pipe.encode_text(args.target_prompt)

    xt = jax.jit(
        lambda mp, w, r: sdedit_loop(
            pipe.sched, pipe.bind(mp).make_eps_pair(uncond, tgt), w, r,
            skip=skip, cfg_tar=float(args.cfg_tar), eta=args.eta)
    )(pipe.params_dict(), w0, rng)

    x_dec = np.clip(np.asarray(pipe.vae_decode(xt)), -1, 1)

    save_path = os.path.join(
        args.results_path,
        args.model_id.split("/")[1] if "/" in args.model_id else args.model_id,
        os.path.basename(args.init_im).split(".")[0],
        "pmt_" + "__".join(x.replace(" ", "_") for x in args.target_prompt)
        + "__neg__" + "__".join(x.replace(" ", "_") for x in args.target_neg_prompt),
    )
    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, image_name + ".png")
    save_image(out, x_dec)
    save_image(os.path.join(save_path, "orig.png"), np.asarray(x0))
    dump_run_summary(save_path, args, {"seed": seed})
    print(f"[+] saved {out}")
    wandb.finish()
    return out


# --------------------------------------------------------------- pc extract
def pc_extract_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Extract PCs for a real image")
    p.add_argument("--device_num", type=int, default=0)
    p.add_argument("-s", "--seed", type=int, default=None)
    p.add_argument("--cfg_tar", type=float, nargs="+", default=[3])
    p.add_argument("--model_id", type=str, choices=IMAGE_MODEL_CHOICES,
                   default="CompVis/stable-diffusion-v1-4")
    p.add_argument("--init_im", type=str, required=True)
    p.add_argument("--num_diffusion_steps", type=int, default=100)
    p.add_argument("--source_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--target_neg_prompt", type=str, nargs="+", default=[""])
    p.add_argument("--corr_to_swap", type=float, default=0.8)
    p.add_argument("--drift_start", type=int, default=None)
    p.add_argument("--drift_end", type=int, default=None)
    p.add_argument("--results_path", default="pc_extractions")
    p.add_argument("-c", "--const", type=float, default=1e-3)
    p.add_argument("--n_evs", type=int, default=1)
    p.add_argument("-p", "--patch", nargs=4, default=None, type=int,
                   help="top bottom left right latent patch to restrict PCs to")
    p.add_argument("-t", "--iters", type=int, default=50)
    p.add_argument("-r", "--resize", nargs=2, type=int, default=(256, 256))
    p.add_argument("-d", "--dry", action="store_true")
    p.add_argument("--weights_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--wandb_name", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    p.add_argument("--wandb_disable", action="store_true")
    p.add_argument("--ts_chunk", type=int, default=1,
                   help="batch this many timesteps' power iterations into "
                        "one vmapped program (see main_pc_extract_inv.py)")
    return p


def pc_extract_main(argv=None):
    from .common import timestamp_name

    args = pc_extract_parser().parse_args(argv)
    args.pc_mode = "both"
    args.eta = 1.0
    args.numerical_fix = True
    if not os.path.exists(args.init_im):
        raise FileNotFoundError(f"--init_im: no such file: {args.init_im}")
    seed = set_reproducibility(args.seed)
    rng = jax.random.PRNGKey(seed)
    cfg_tar = float(np.atleast_1d(args.cfg_tar)[0])

    if args.drift_start is None:
        args.drift_start = args.num_diffusion_steps
    if args.drift_end is None:
        args.drift_end = -1

    image_name = (
        f"s{args.seed}_"
        + (f"p{'-'.join(str(x) for x in args.patch)}_" if args.patch is not None else "")
        + f"pc-{args.pc_mode}_cfgd{args.cfg_tar}_"
        + f"drift{args.drift_start}-{args.drift_end}_it{args.iters}_c{args.const:.1e}"
        + f"_{timestamp_name()}"
    )
    wandb = init_wandb(args, "pc_extraction_inv_images", image_name)
    if args.weights_dir is None:
        warnings.warn("--weights_dir not given: running with RANDOM weights.")

    if args.dtype == "bfloat16":
        # Same override as cli/pc_extract.py: the finite-difference power
        # iteration probe sits below bf16 quantization and NaNs out.
        warnings.warn("--dtype bfloat16 is numerically unsound for "
                      "finite-difference PC extraction (probe below bf16 "
                      "quantization); overriding to float32.")
        args.dtype = "float32"
    pipe = load_model(args.model_id, args.num_diffusion_steps,
                      weights_dir=args.weights_dir, dtype=jnp.float32)
    x0 = jnp.asarray(load_image(args.init_im, resize=tuple(args.resize)))
    w0 = pipe.vae_encode(x0)

    save_path = os.path.join(
        args.results_path,
        args.model_id.split("/")[1] if "/" in args.model_id else args.model_id,
        os.path.basename(args.init_im).split(".")[0],
        "pmt_" + "__".join(x.replace(" ", "_") for x in args.source_prompt)
        + "__neg__" + "__".join(x.replace(" ", "_") for x in args.target_neg_prompt),
    )
    os.makedirs(save_path, exist_ok=True)

    ckpt_path, xt = run_pc_extraction(
        args, pipe, w0, rng, cfg_tar, save_path, image_name, seed
    )

    x_dec = np.clip(np.asarray(pipe.vae_decode(xt)), -1, 1)
    save_image(os.path.join(save_path, image_name + ".png"), x_dec)
    save_image(os.path.join(save_path, "orig.png"), np.asarray(x0))
    dump_run_summary(save_path, args, {"seed": seed})
    print(f"[+] extraction saved to {ckpt_path}")
    wandb.finish()
    return ckpt_path


# --------------------------------------------------------------- pc apply
def pc_apply_main(argv=None):
    args = pc_apply_parser().parse_args(argv)
    args.shift_x0_for_np = True
    args.sub_iters = None
    if args.drift_start < args.drift_end:
        raise ValueError("Drift start must be greater than drift end")
    seed = set_reproducibility(args.seed)
    for suffix in (".pt", ".npz"):
        if args.extraction_path.endswith(suffix):
            args.extraction_path = args.extraction_path[: -len(suffix)]
    wandb = init_wandb(args, "pc_application_images",
                       f"drift{args.drift_start}-{args.drift_end}_a{args.amount}")

    load = load_extraction(args.extraction_path)
    ex_args = load["args"]
    eigdata = load["eigdata"]
    latents = jnp.asarray(load["latents"])
    xts = jnp.asarray(load["xts"]) if args.fix_alpha is not None else None

    nprng = np.random.default_rng(seed)
    if args.rand_v:
        for k in eigdata:
            v = eigdata[k]["eigvec"]
            norm = np.linalg.norm(v)
            r = nprng.standard_normal(v.shape).astype(np.float32)
            eigdata[k]["eigvec"] = r / np.linalg.norm(r) * norm

    args.fade_length = int(args.fade_length * latents.shape[3] / 15)
    S = int(ex_args.num_diffusion_steps)
    if args.weights_dir is None and getattr(ex_args, "weights_dir", None):
        args.weights_dir = ex_args.weights_dir
    if args.weights_dir is None:
        warnings.warn("running with RANDOM weights.")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = load_model(ex_args.model_id, S, weights_dir=args.weights_dir, dtype=dtype)
    cfg_tar = float(getattr(ex_args, "cfg_tar_scalar", np.atleast_1d(ex_args.cfg_tar)[0]))
    eta = float(ex_args.eta)

    xt = run_pc_application(args, pipe, ex_args, eigdata, latents, xts, cfg_tar, eta)

    drifts_path = args.extraction_path + "_driftgens"
    os.makedirs(drifts_path, exist_ok=True)

    outputs = []
    for i in range(xt.shape[0]):
        x_dec = np.clip(np.asarray(pipe.vae_decode(xt[i: i + 1])), -1, 1)
        ev_tag = ("pcs" + "".join(str(x) for x in args.evs)) if args.combine_evs \
            else f"pc{args.evs[min(i, len(args.evs) - 1)]}"
        name = (
            f"{ev_tag}_drift{args.drift_start}-{args.drift_end}"
            f'{"_RAND" if args.rand_v else ""}_a{args.amount}.png'
        )
        out = os.path.join(drifts_path, name)
        save_image(out, x_dec)
        outputs.append(out)
    dump_run_summary(drifts_path, args, {"seed": seed})
    for o in outputs:
        print(f"[+] saved {o}")
    wandb.finish()
    return outputs
