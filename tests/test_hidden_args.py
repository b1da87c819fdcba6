"""Hidden-arg parity: each CLI's effective post-parse defaults must equal
the reference's hard-coded values.

The reference overrides several "hidden" options AFTER argparse:
- /root/reference/code/main_run.py:64-66          (eta, numerical_fix,
  test_rand_gen)
- /root/reference/code/main_pc_extract_inv.py:65-69 (pc_mode, eta,
  numerical_fix, double_precision, test_rand_gen)
- /root/reference/code/main_pc_apply_drift.py:37-38 (shift_x0_for_np,
  sub_iters)

The eval sweeps depend on these being in effect, so they are pinned here as
a table.
"""

import pytest

from audioeditingcode_tpu.cli import pc_apply, pc_extract, run

CASES = [
    # (module, argv, {hidden arg: reference value}, reference citation)
    (
        run,
        ["--init_aud", "x.wav", "--target_prompt", "p"],
        {"eta": 1.0, "numerical_fix": True, "test_rand_gen": False},
        "main_run.py:64-66",
    ),
    (
        pc_extract,
        ["--init_aud", "x.wav"],
        {
            "pc_mode": "both",
            "eta": 1.0,
            "numerical_fix": True,
            "double_precision": False,
            "test_rand_gen": False,
        },
        "main_pc_extract_inv.py:65-69",
    ),
    (
        pc_apply,
        ["--extraction_path", "x.npz", "--drift_start", "100",
         "--drift_end", "50", "--amount", "3"],
        {"shift_x0_for_np": True, "sub_iters": None},
        "main_pc_apply_drift.py:37-38",
    ),
]


@pytest.mark.parametrize("mod,argv,expected,cite", CASES,
                         ids=[c[3] for c in CASES])
def test_hidden_args_match_reference(mod, argv, expected, cite):
    args = mod.parse_args(argv)
    for name, value in expected.items():
        assert hasattr(args, name), f"{cite}: missing hidden arg {name}"
        assert getattr(args, name) == value, (
            f"{cite}: {name}={getattr(args, name)!r}, reference fixes {value!r}"
        )


def test_run_flag_defaults_match_reference():
    """Visible flag defaults the sweeps rely on (main_run.py:37-51)."""
    args = run.parse_args(["--init_aud", "x.wav", "--target_prompt", "p"])
    assert args.cfg_src == [3]
    assert args.cfg_tar == [12]
    assert args.num_diffusion_steps == 200
    assert args.tstart == [100]
    assert args.mode == "ours"
    assert args.fix_alpha == 0.1
