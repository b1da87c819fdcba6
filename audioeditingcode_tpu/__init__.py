"""TPU-native zero-shot audio editing framework.

A brand-new JAX / Flax / Pallas implementation of the capabilities of
HilaManor/AudioEditingCode ("Zero-Shot Unsupervised and Text-Based Audio
Editing Using DDPM Inversion", ICML 2024):

- text-based editing via edit-friendly DDPM inversion
  (reference: code/ddm_inversion/inversion_utils.py)
- unsupervised editing along posterior principal components
  (reference: code/pc_drift.py)
- DDIM-inversion and SDEdit baselines
- AudioLDM / AudioLDM2 / TANGO latent-diffusion UNets and the
  Stable Audio Open DiT as Flax modules

Design stance (TPU-first, not a port):
- diffusion numerics are stateless pure functions over a precomputed
  ``DiffusionSchedule`` pytree (audioeditingcode_tpu.schedulers)
- editing loops compile to single ``lax.scan`` programs with the full
  noise-map trajectory resident in HBM (audioeditingcode_tpu.editing)
- cond/uncond classifier-free guidance is batched into one UNet forward
- the STFT/mel frontend is a framed-matmul kernel that maps onto the MXU
  (audioeditingcode_tpu.ops.stft)
- multi-device scaling via jax.sharding.Mesh + shard_map
  (audioeditingcode_tpu.parallel)
"""

__version__ = "0.1.0"
