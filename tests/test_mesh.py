"""Multi-device mesh tests on the virtual 8-device CPU mesh.

SURVEY.md §4: 'mesh tests that run the same edit on 1 vs N devices and
assert tolerance equality' — the replacement for multi-node testing
without a real cluster.
"""

import sys
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# NOTE: the full dryrun_multichip content is covered by
# tests/test_graft_entry.py::test_dryrun_multichip_self_provisions, which
# additionally validates the driver-faithful fresh-process self-provisioning
# path; an in-process duplicate here was dropped for suite wall time.


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_sharded_edit_matches_single_device():
    from audioeditingcode_tpu.models.registry import load_model
    from audioeditingcode_tpu.editing.cfg import build_cfg_tensors
    from audioeditingcode_tpu.editing.invert import (
        inversion_forward_process,
        inversion_reverse_process,
    )
    from audioeditingcode_tpu.parallel.mesh import make_mesh, shard_module_params

    pipe = load_model("test/tiny-audioldm", num_diffusion_steps=4, latent_time=16)
    shape = (1, 4, 16, 32)
    w0 = jax.random.normal(jax.random.PRNGKey(0), shape)
    uncond = pipe.encode_text([""])
    tgt = pipe.encode_text(["x"])
    cfg_t, _ = build_cfg_tensors(shape, ["x"], [4.0])
    denoise = pipe.make_denoiser(uncond, tgt, cfg_t)

    def edit(w0, rng):
        _, zs, xts = inversion_forward_process(pipe.sched, denoise, w0, rng)
        return inversion_reverse_process(pipe.sched, denoise, xts, zs[:3])

    ref = np.asarray(jax.jit(edit)(w0, jax.random.PRNGKey(1)))

    # CLI-faithful form: params travel as jit ARGUMENTS carrying their
    # NamedShardings (cli/run.py threads pipe.params_dict() the same way).
    # Closure-captured params would be baked into the program as full-size
    # constants and the "sharded" run would silently compile single-device
    # — see test_tp_compiled_collectives_move_activations_not_weights.
    mesh = make_mesh(4)
    pipe.unet_params = shard_module_params(pipe.unet_params, mesh)
    params = pipe.params_dict()

    @jax.jit
    def edit_sharded(params, w0, rng):
        p = pipe.bind(params)
        den = p.make_denoiser(uncond, tgt, cfg_t)
        _, zs, xts = inversion_forward_process(p.sched, den, w0, rng)
        return inversion_reverse_process(p.sched, den, xts, zs[:3])

    with mesh:
        out = np.asarray(edit_sharded(params, w0, jax.random.PRNGKey(1)))

    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_tp_compiled_collectives_move_activations_not_weights():
    """tp must communicate ACTIVATIONS, not weights (VERDICT r3 #6).

    shard_module_params shards every kernel's output-channel axis and lets
    GSPMD insert the collectives (parallel/mesh.py:9-11). The whole value
    of tp on a real ICI mesh is that the per-step traffic is activation
    gathers/reductions — if GSPMD instead fell back to re-assembling full
    weight matrices every step, tp would move the entire model per step
    and be strictly worse than replication. With one real chip available,
    the honest proxy is an HLO-text assertion on the CPU mesh: compile the
    CLI-faithful params-as-arguments CFG step and check (a) the program is
    actually partitioned, (b) no all-gather result is weight-shaped."""
    import re

    from audioeditingcode_tpu.models.registry import load_model
    from audioeditingcode_tpu.editing.cfg import build_cfg_tensors
    from audioeditingcode_tpu.parallel.mesh import make_mesh, shard_module_params

    pipe = load_model("test/tiny-audioldm", num_diffusion_steps=4, latent_time=16)
    shape = (1, 4, 16, 32)
    uncond = pipe.encode_text([""])
    tgt = pipe.encode_text(["x"])
    cfg_t, _ = build_cfg_tensors(shape, ["x"], [4.0])
    mesh = make_mesh(4, dp=1, tp=4)

    # full (pre-shard) kernel shapes that _param_spec shards over tp=4
    tp_kernel_shapes = set()
    for path, x in jax.tree_util.tree_leaves_with_path(pipe.unet_params):
        leaf = getattr(path[-1], "key", getattr(path[-1], "name", ""))
        if leaf == "kernel" and x.ndim >= 2 and x.shape[-1] % 4 == 0:
            tp_kernel_shapes.add(tuple(x.shape))
    assert tp_kernel_shapes, "no tp-shardable kernels found"

    pipe.unet_params = shard_module_params(pipe.unet_params, mesh)
    params = pipe.params_dict()
    xt = jax.random.normal(jax.random.PRNGKey(0), shape)

    @jax.jit
    def step(params, x):
        p = pipe.bind(params)
        den = p.make_denoiser(uncond, tgt, cfg_t)
        return den(x, jnp.asarray(2))

    with mesh:
        txt = step.lower(params, xt).compile().as_text()

    # (a) really partitioned: GSPMD produced a 4-partition program with
    # collectives (a closure-captured-params build compiles single-device
    # with zero collectives — the failure mode this test pins down)
    n_collectives = sum(txt.count(k) for k in
                        ("all-gather(", "all-reduce(", "reduce-scatter(",
                         "collective-permute("))
    assert "num_partitions=4" in txt
    assert n_collectives > 0

    # (b) no all-gather result re-assembles a full weight matrix: every
    # gather output must differ from every sharded kernel's full shape
    # (any axis order — GSPMD may transpose)
    gather_shapes = set()
    for m in re.finditer(r"= \w+\[([\d,]*)\][^\n]*\ball-gather\(", txt):
        dims = tuple(int(d) for d in m.group(1).split(",") if d)
        if dims:
            gather_shapes.add(dims)
    assert gather_shapes, "partitioned program with no all-gathers?"
    kernel_sorted = {tuple(sorted(s)) for s in tp_kernel_shapes}
    for g in gather_shapes:
        assert tuple(sorted(g)) not in kernel_sorted, (
            f"all-gather re-assembles a weight matrix: {g}")


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_dp_sharded_ev_batch_matches_single_device():
    from audioeditingcode_tpu.models.registry import load_model
    from audioeditingcode_tpu.models.text_encoders import repeat_cond
    from audioeditingcode_tpu.editing.pc_drift import forward_directional
    from audioeditingcode_tpu.parallel.mesh import batch_sharding, make_mesh

    pipe = load_model("test/tiny-audioldm", num_diffusion_steps=4, latent_time=16)
    n_ev = 4
    shape = (n_ev, 4, 16, 32)
    xt = jax.random.normal(jax.random.PRNGKey(2), shape)
    lat = jax.random.normal(jax.random.PRNGKey(3), shape)
    eps_pair = pipe.make_eps_pair(
        repeat_cond(pipe.encode_text([""]), n_ev),
        repeat_cond(pipe.encode_text(["y"]), n_ev),
    )

    def step(xt, lat):
        return forward_directional(pipe.sched, eps_pair, xt, jnp.asarray(1), lat, 3.0)

    ref_prev, ref_x0 = jax.jit(step)(xt, lat)

    mesh = make_mesh(4, dp=4, tp=1)
    shard = batch_sharding(mesh, 4)
    with mesh:
        prev, x0p = jax.jit(step)(jax.device_put(xt, shard), jax.device_put(lat, shard))

    np.testing.assert_allclose(np.asarray(prev), np.asarray(ref_prev), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x0p), np.asarray(ref_x0), atol=1e-4)


def test_cli_mesh_flags(tmp_path):
    """--dp/--tp on the edit CLI shard the model over the virtual mesh."""
    import numpy as np

    from audioeditingcode_tpu.cli import run
    from audioeditingcode_tpu.utils.audio_io import write_wav

    sr = 16000
    t = np.arange(sr // 2, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    write_wav(p, (0.4 * np.sin(2 * np.pi * 330 * t))[None], sr)

    out = run.main([
        "--model_id", "test/tiny-audioldm", "--init_aud", p,
        "--target_prompt", "a trumpet", "--num_diffusion_steps", "4",
        "--tstart", "3", "--results_path", str(tmp_path / "r"),
        "--seed", "0", "--tp", "2", "--dp", "2",
    ])
    import os
    assert os.path.exists(out)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
@pytest.mark.slow
def test_pc_extract_ts_chunk_shards_over_dp(tmp_path):
    """Timestep-chunked PC extraction with the chunk axis sharded over a
    4-way dp mesh runs end-to-end and writes a loadable checkpoint."""
    import numpy as np

    from audioeditingcode_tpu.cli.pc_extract import main as extract
    from audioeditingcode_tpu.editing.pcdata import load_extraction
    from audioeditingcode_tpu.utils.audio_io import write_wav

    sr = 16000
    t = np.arange(sr // 4, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    write_wav(p, (0.4 * np.sin(2 * np.pi * 330 * t))[None], sr)

    ckpt = extract([
        "--model_id", "test/tiny-audioldm", "--init_aud", p,
        "--num_diffusion_steps", "6",
        "--drift_start", "6", "--drift_end", "2",  # 4-timestep window
        "--iters", "3", "--ts_chunk", "4", "--dp", "4",
        "--results_path", str(tmp_path / "pc"),
        "--seed", "3", "--wandb_disable",
    ])
    loaded = load_extraction(ckpt[: -len(".npz")])
    assert len(loaded["eigdata"]) == 4
    assert np.isfinite(loaded["eig_vecs"]).all()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sp_sharded_dit_denoise_matches_single_device():
    """Sequence-parallel Stable Audio: the DiT latent sequence axis sharded
    over 'sp' on a ('dp','tp','sp') mesh produces the same denoiser output
    as the unsharded model (GSPMD inserts the K/V gathers)."""
    from audioeditingcode_tpu.models.registry import load_model
    from audioeditingcode_tpu.parallel.mesh import (
        make_mesh,
        seq_sharding,
        shard_module_params,
    )

    pipe = load_model("test/tiny-stable-audio", num_diffusion_steps=4)
    shape = (1, 4, pipe.sample_size)
    w = jax.random.normal(jax.random.PRNGKey(0), shape)
    den = pipe.make_denoiser(
        pipe.encode_text([""], negative=True),
        pipe.encode_text(["tiny"]),
        jnp.full((1,) + shape[1:], 3.0),
    )

    ref = np.asarray(jax.jit(den)(w, jnp.asarray(1))[0])

    mesh = make_mesh(8, tp=2, sp=2)
    assert dict(mesh.shape) == {"dp": 2, "tp": 2, "sp": 2}
    pipe.dit_params = shard_module_params(pipe.dit_params, mesh)
    den_sharded = pipe.make_denoiser(
        pipe.encode_text([""], negative=True),
        pipe.encode_text(["tiny"]),
        jnp.full((1,) + shape[1:], 3.0),
    )
    w_sp = jax.device_put(w, seq_sharding(mesh, len(shape)))
    with mesh:
        out = np.asarray(jax.jit(den_sharded)(w_sp, jnp.asarray(1))[0])

    np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_sp_mesh_keeps_pallas_kernel(monkeypatch):
    """Under an sp mesh the attention dispatcher must route through the
    shard_map-wrapped Pallas kernel — each shard's query block against the
    sp-gathered K/V — instead of silently reverting to XLA attention and
    forfeiting the kernel win (VERDICT r3 #5). Exercised in interpret mode
    on the virtual mesh; asserts both parity and that the sp wrapper
    actually engaged. Uses an odd sequence length (the DiT's real S=1025
    has a prepended global token) and grouped K/V heads."""
    import audioeditingcode_tpu.ops.flash_attention as fa
    from audioeditingcode_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("PALLAS_INTERPRET_ATTENTION", "1")
    monkeypatch.setattr(fa, "_MIN_SEQ_FOR_KERNEL", 8)

    B, S, H, Hkv, D = 2, 129, 8, 4, 32
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), dtype=jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D))
    ref = jax.nn.dot_product_attention(q, k, v)

    calls = []
    real_sp = fa._sp_blocked_attention
    monkeypatch.setattr(
        fa, "_sp_blocked_attention",
        lambda *a, **kw: (calls.append(1), real_sp(*a, **kw))[1])

    mesh = make_mesh(4, dp=1, tp=2, sp=2)
    with mesh:
        out = jax.jit(fa.fused_attention)(q, k, v)
    assert calls, "sp mesh active but the shard_map kernel path not taken"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # CLI-faithful routing: the CLIs never enter `with mesh:` (they shard
    # via device_put(NamedSharding) only) — they enter sp_mesh_scope(mesh)
    # around the jitted edit instead, and the dispatcher must engage from
    # that scope alone
    calls.clear()
    with fa.sp_mesh_scope(mesh):
        out_scope = jax.jit(
            lambda q, k, v: fa.fused_attention(q, k, v))(q, k, v)
    assert calls, "sp_mesh_scope set but the shard_map kernel path not taken"
    np.testing.assert_allclose(np.asarray(out_scope), np.asarray(ref),
                               atol=2e-5)

    # and a scope with a meshless/no-sp value is a clean no-op
    calls.clear()
    with fa.sp_mesh_scope(None):
        jax.jit(lambda q, k, v: fa.fused_attention(q, k, v) * 1.0)(q, k, v)
    assert not calls

    # rotary rides the sp path too (applied on the host before sharding)
    rot = 16
    ang = (jnp.arange(S, dtype=jnp.float32)[:, None]
           * jnp.exp(-jnp.arange(rot // 2) / (rot // 2))[None, :])
    cos = jnp.concatenate([jnp.cos(ang)] * 2, -1)
    sin = jnp.concatenate([jnp.sin(ang)] * 2, -1)
    ref_r = jax.nn.dot_product_attention(
        fa._host_rotary(q, cos, sin), fa._host_rotary(k, cos, sin), v)
    with mesh:
        out_r = jax.jit(
            lambda q, k, v: fa.fused_attention(q, k, v, rotary=(cos, sin))
        )(q, k, v)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(ref_r),
                               atol=2e-5)

    # a mesh with a REAL dp axis alongside sp (the CLI's --dp 2 --sp 2
    # shape): batch stays replicated across the sp groups, parity holds
    if jax.device_count() >= 8:
        mesh8 = make_mesh(8, dp=2, tp=2, sp=2)
        with mesh8:
            out8 = jax.jit(fa.fused_attention)(q, k, v)
        np.testing.assert_allclose(np.asarray(out8), np.asarray(ref),
                                   atol=2e-5)


def test_sp1_single_device_mesh_routes_kernel(monkeypatch):
    """An explicitly-requested sp axis of size 1 on a SINGLE device still
    builds the 3-axis mesh and routes attention through the shard_map
    Pallas path (the all_gather over a 1-member axis is the identity).
    This is the exact shape of the single-chip hardware rehearsal of the
    sp kernel path (VERDICT r4 #5): on a 1-chip TPU, `--sp 1` is the only
    way to compile+execute the shard_map + Mosaic lowering for real."""
    import audioeditingcode_tpu.ops.flash_attention as fa
    from audioeditingcode_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("PALLAS_INTERPRET_ATTENTION", "1")
    monkeypatch.setattr(fa, "_MIN_SEQ_FOR_KERNEL", 8)

    B, S, H, Hkv, D = 1, 129, 8, 4, 32
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, S, H, D), dtype=jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, Hkv, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, Hkv, D))
    ref = jax.nn.dot_product_attention(q, k, v)

    calls = []
    real_sp = fa._sp_blocked_attention
    monkeypatch.setattr(
        fa, "_sp_blocked_attention",
        lambda *a, **kw: (calls.append(1), real_sp(*a, **kw))[1])

    mesh = make_mesh(1, dp=1, tp=1, sp=1)
    assert dict(mesh.shape) == {"dp": 1, "tp": 1, "sp": 1}
    with fa.sp_mesh_scope(mesh):
        out = jax.jit(lambda q, k, v: fa.fused_attention(q, k, v))(q, k, v)
    assert calls, "sp=1 mesh set but the shard_map kernel path not taken"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_cli_sp_flag_stable_audio(tmp_path, monkeypatch):
    """--sp on the edit CLI runs a sequence-parallel Stable Audio edit on a
    ('dp','tp','sp') mesh end-to-end — AND actually routes the DiT
    self-attention through the shard_map Pallas kernel. The engagement
    assertion is the regression guard for the round-4 fix: the CLI traces
    its jitted edit OUTSIDE any `with mesh:` context, so only the
    sp_mesh_scope it enters can activate the sp kernel path (a silent
    fallback here is exactly the round-3 '--sp forfeits the kernel'
    caveat coming back)."""
    import numpy as np

    import audioeditingcode_tpu.ops.flash_attention as fa
    from audioeditingcode_tpu.cli import run
    from audioeditingcode_tpu.utils.audio_io import write_wav

    # tiny DiT sequence is 17 (16 latents + global token): let the
    # dispatcher consider it, and run the kernel via the interpreter on CPU
    monkeypatch.setenv("PALLAS_INTERPRET_ATTENTION", "1")
    monkeypatch.setattr(fa, "_MIN_SEQ_FOR_KERNEL", 8)
    calls = []
    real_sp = fa._sp_blocked_attention
    monkeypatch.setattr(
        fa, "_sp_blocked_attention",
        lambda *a, **kw: (calls.append(1), real_sp(*a, **kw))[1])

    sr = 4000
    t = np.arange(200, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    write_wav(p, (0.4 * np.sin(2 * np.pi * 220 * t))[None], sr)

    out = run.main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", p,
        "--target_prompt", "a violin", "--num_diffusion_steps", "4",
        "--tstart", "3", "--results_path", str(tmp_path / "r"),
        "--seed", "0", "--dp", "2", "--tp", "2", "--sp", "2",
    ])
    assert os.path.exists(out)
    assert calls, ("--sp edit ran but the sp shard_map Pallas path never "
                   "engaged — the CLI lost its sp_mesh_scope routing")


def test_cli_sp1_single_chip_rehearsal(tmp_path, monkeypatch):
    """An explicit `--sp 1` on a single device is the CLI shape of the
    sp-kernel hardware rehearsal (VERDICT r4 #5): it must build the
    dp1 x tp1 x sp1 mesh and route DiT attention through the shard_map
    Pallas path — NOT silently fall back to the meshless fast path the
    un-passed default takes. A regression to the old `sp > 1` filtering
    would disable the only sp lowering check a 1-chip TPU allows."""
    import numpy as np

    import audioeditingcode_tpu.ops.flash_attention as fa
    from audioeditingcode_tpu.cli import run
    from audioeditingcode_tpu.utils.audio_io import write_wav

    monkeypatch.setenv("PALLAS_INTERPRET_ATTENTION", "1")
    monkeypatch.setattr(fa, "_MIN_SEQ_FOR_KERNEL", 8)
    calls = []
    real_sp = fa._sp_blocked_attention
    monkeypatch.setattr(
        fa, "_sp_blocked_attention",
        lambda *a, **kw: (calls.append(1), real_sp(*a, **kw))[1])

    sr = 4000
    t = np.arange(200, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    write_wav(p, (0.4 * np.sin(2 * np.pi * 220 * t))[None], sr)

    out = run.main([
        "--model_id", "test/tiny-stable-audio", "--init_aud", p,
        "--target_prompt", "a violin", "--num_diffusion_steps", "4",
        "--tstart", "3", "--results_path", str(tmp_path / "r"),
        "--seed", "0", "--sp", "1",
    ])
    assert os.path.exists(out)
    assert calls, ("--sp 1 edit ran but the sp shard_map Pallas path never "
                   "engaged — the single-chip rehearsal is a silent no-op")


def test_cli_sp_flag_rejected_for_mel(tmp_path):
    """--sp on a mel-family model is an explicit error."""
    import numpy as np

    from audioeditingcode_tpu.cli import run
    from audioeditingcode_tpu.utils.audio_io import write_wav

    sr = 16000
    t = np.arange(sr // 2, dtype=np.float32) / sr
    p = str(tmp_path / "clip.wav")
    write_wav(p, (0.4 * np.sin(2 * np.pi * 330 * t))[None], sr)

    with pytest.raises(ValueError, match="stable-audio"):
        run.main([
            "--model_id", "test/tiny-audioldm", "--init_aud", p,
            "--target_prompt", "a trumpet", "--num_diffusion_steps", "4",
            "--tstart", "3", "--results_path", str(tmp_path / "r"),
            "--seed", "0", "--sp", "2",
        ])
