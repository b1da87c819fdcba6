"""bench.py orchestrator plumbing tests (VERDICT r2 #1).

The driver records the LAST JSON line of bench.py's output, so the
orchestrator must (a) run families headline-first in fresh subprocesses,
(b) re-print the cumulative result line after EVERY family, (c) retry a
failed family, and (d) never let one family's failure kill the run.

These tests drive the orchestration path with BENCH_FAKE=1 (synthetic rows,
no JAX import) so they exercise the subprocess/retry/streaming logic in
milliseconds; the measurement path itself is covered by the driver's real
TPU run.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _run(env_extra, timeout=120):
    env = {k: v for k, v in os.environ.items() if not k.startswith("BENCH_")}
    # Drop the ambient PYTHONPATH (/root/.axon_site): its sitecustomize
    # imports the TPU plugin at EVERY python startup (~2s); the BENCH_FAKE
    # plumbing children never touch JAX, and these tests spawn ~10 of them
    # each — this one line is ~50s of suite wall time.
    env.pop("PYTHONPATH", None)
    env.update({"BENCH_FAKE": "1", "BENCH_RETRY_SLEEP_S": "0"})
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH], env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _json_lines(stdout):
    out = []
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_streams_cumulative_line_per_family_headline_first():
    proc = _run({})
    assert proc.returncode == 0, proc.stderr
    lines = _json_lines(proc.stdout)
    # ONE cumulative line per family (7 specs) plus one line after the
    # DEFERRED headline consistency re-measure: the re-measure costs a
    # whole extra child, so it runs only after every family has had a
    # chance to land a row in the driver window (rounds 1-4 driver
    # artifacts never held an AudioLDM-s/-l/TANGO row because the old
    # ordering ran the consistency child second)
    assert len(lines) == 8
    # the FIRST line already carries the headline family — a driver kill
    # at any later point still records the most important number
    first = lines[0]
    head0 = first["detail"]["families"][0]
    assert head0["model"] == "cvssp/audioldm2-music"
    assert first["value"] > 0
    assert "consistency" not in head0  # pre-consistency snapshot
    # every family lands BEFORE the headline's consistency re-measure
    assert len(lines[6]["detail"]["families"]) == 7
    assert "consistency" not in lines[6]["detail"]["families"][0]
    # the headline is re-measured in a second fresh process (VERDICT r3
    # #1), refreshing the final cumulative line
    head = lines[7]["detail"]["families"][0]
    assert head["consistency"] == "two_run_agreement"
    assert head["consistency_runs"] == [50.0, 50.0]
    # identical digests prove both processes ran the same program
    assert len(set(head["consistency_digests"])) == 1
    # phase context per consistency run (wall-slow-but-correct outliers
    # stay self-explaining in the artifact)
    assert len(head["consistency_child_walls_s"]) == 2
    last = lines[-1]
    assert len(last["detail"]["families"]) == 7
    assert last["metric"] == "unet_steps_per_sec_per_chip"
    # the worst-case headline config is labelled in the top-level detail
    assert last["detail"]["config"] == "worst_case_batch2_cfg"
    assert "note" not in last["detail"]
    # every row self-explains its cost phases (VERDICT r4 #2)
    for r in last["detail"]["families"]:
        for key in ("load_s", "compile_s", "cache_hits", "cache_misses",
                    "out_digest", "child_wall_s", "clips_per_min"):
            assert key in r, f"{r['model']} missing {key}"


def test_failed_family_is_retried_then_skipped_without_killing_run():
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm2-music,declare-lab/tango-full-ft-audiocaps",
        "BENCH_FAKE_FAIL": "declare-lab/tango-full-ft-audiocaps",
    })
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    models = [r["model"] for r in last["detail"]["families"]]
    # the model filter keeps both audioldm2 configs (worst-case + empty_src)
    assert models == ["cvssp/audioldm2-music", "cvssp/audioldm2-music"]
    assert "tango" in last["detail"]["note"]
    # non-headline families get 2 attempts
    assert proc.stderr.count("tango-full-ft-audiocaps attempt") == 2


def test_headline_failure_falls_back_to_first_completed_row():
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm2-music,cvssp/audioldm-s-full-v2",
        "BENCH_FAKE_FAIL": "cvssp/audioldm2-music",
    })
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    assert last["value"] > 0  # falls back to the empty_src headline row
    # ... but the fallback's easier config is labelled (r3 advisor finding)
    assert last["detail"]["config"] == "empty_src_batch1_fwd"
    assert "audioldm2-music" in last["detail"]["note"]
    # headline gets an extra (3rd) attempt
    assert proc.stderr.count("audioldm2-music attempt") == 3


def test_all_failed_still_prints_parseable_line():
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm-s-full-v2",
        "BENCH_FAKE_FAIL": "cvssp/audioldm-s-full-v2",
    })
    assert proc.returncode == 1
    last = _json_lines(proc.stdout)[-1]
    assert last["value"] == 0.0
    assert "all families failed" in last["detail"]["note"]


def test_models_env_filters_and_keeps_both_stable_audio_configs():
    proc = _run({"BENCH_MODELS": "stabilityai/stable-audio-open-1.0"})
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    fams = last["detail"]["families"]
    assert len(fams) == 2
    assert fams[0].get("config") is None
    assert fams[1]["config"] == "empty_src_batch1_fwd"


def test_headline_disagreement_resolved_by_third_run(tmp_path):
    """Two fresh-process headline runs that disagree >15% trigger a third;
    the FASTEST of all runs wins (VERDICT r3 #1: every rep materializes
    its output, so wall time is a strict upper bound on device execution —
    a degraded tunnel/chip can only make a run SLOWER than the truth)."""
    # child order: headline, empty_src family (99), then the DEFERRED
    # consistency children (30 -> disagree -> 48)
    seq = tmp_path / "vals.txt"
    seq.write_text("50,99,30,48")
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm2-music",
        "BENCH_FAKE_VALUE_FILE": str(seq),
    })
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    head = last["detail"]["families"][0]
    assert head["consistency"] == "third_run_fastest"
    assert head["consistency_runs"] == [50.0, 30.0, 48.0]
    assert last["value"] == 50.0


def test_degraded_pair_cannot_outvote_fast_run(tmp_path):
    """The round-3 failure mode: a session degrades mid-bench and produces
    TWO agreeing slow runs (30, 31) against one credible fast run (50).
    A closest-pair majority would publish 31; the fastest-run rule keeps
    50 (PERF_NOTES.md 'Measurement trust': within a degraded session even
    fresh-process re-runs agree with each other while being wrong)."""
    seq = tmp_path / "vals.txt"
    seq.write_text("50,99,30,31")  # 99 = interleaved empty_src family child
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm2-music",
        "BENCH_FAKE_VALUE_FILE": str(seq),
    })
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    head = last["detail"]["families"][0]
    assert head["consistency"] == "third_run_fastest"
    assert head["consistency_runs"] == [50.0, 30.0, 31.0]
    assert last["value"] == 50.0


def test_stalled_family_is_remeasured(tmp_path):
    """A non-headline family whose reps show >1.3x spread (an intra-process
    tunnel stall) is re-measured in another fresh process."""
    seq = tmp_path / "vals.txt"
    seq.write_text("20,50")
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm-s-full-v2",
        "BENCH_FAKE_VALUE_FILE": str(seq),
        "BENCH_FAKE_SPREAD": "2.0",
    })
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    row = last["detail"]["families"][0]
    # both runs recorded; the disagreement (20 vs 50) forces a third try,
    # which has no value left in the sequence file and falls back to 50.0
    assert row["steps_per_sec_per_chip"] >= 50.0
    assert len(row["consistency_runs"]) >= 2


def test_extra_model_outside_default_families_runs():
    """An opt-in model id not in the default family list (e.g. the image
    row, CompVis/stable-diffusion-v1-4) is appended and measured."""
    proc = _run({"BENCH_MODELS": "CompVis/stable-diffusion-v1-4"})
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    fams = last["detail"]["families"]
    assert [r["model"] for r in fams] == ["CompVis/stable-diffusion-v1-4"]


def test_digest_mismatch_blocks_fastest_run_rule(tmp_path):
    """Program-identity guard (VERDICT r4 weak #4): when the consistency
    runs disagree on the output digest, they did NOT execute the same
    program, so no speed comparison between them is valid — the protocol
    keeps the FIRST run and marks the row unresolved instead of letting a
    silently-smaller program win on speed."""
    vals = tmp_path / "vals.txt"
    vals.write_text("48,99,50")  # run 2 is "faster" (within agreement band),
    digs = tmp_path / "digs.txt"  # 99 = interleaved empty_src family child
    digs.write_text("aaaa,xxxx,bbbb")  # ... but computed something else
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm2-music",
        "BENCH_FAKE_VALUE_FILE": str(vals),
        "BENCH_FAKE_DIGEST_FILE": str(digs),
    })
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    head = last["detail"]["families"][0]
    assert head["consistency"] == "unresolved: digest mismatch"
    assert head["consistency_digests"] == ["aaaa", "bbbb"]
    assert last["value"] == 48.0  # first run kept, fast impostor rejected


def test_zero_budget_skips_consistency_but_still_publishes(tmp_path):
    """Budget guard (VERDICT r4 #1b): a driver window too small for a
    consistency child must still publish the first row, labelled
    'skipped: budget' — never burn the remaining window on a re-measure."""
    proc = _run({
        "BENCH_MODELS": "cvssp/audioldm2-music",
        "BENCH_BUDGET_S": "0",
    })
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    head = last["detail"]["families"][0]
    assert head["consistency"] == "skipped: budget"
    assert last["value"] == 50.0


def test_batch_lane_spec_reports_clips_per_min():
    """The ':batchN' opt-in spec (VERDICT r4 #7) runs the N-clip vmapped
    edit and reports clips/min — the measured single-chip anchor that the
    mesh dp axis multiplies for the v5e-4 aggregate-throughput story."""
    proc = _run({"BENCH_MODELS": "cvssp/audioldm-s-full-v2:batch4"})
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    row = last["detail"]["families"][0]
    assert row["config"] == "batch4_throughput"
    assert row["clip_batch"] == 4
    assert row["clips_per_min"] == 200.0  # fake value 50.0 * batch 4


def test_sp1_lane_spec_is_labelled():
    """The ':sp1' opt-in spec (VERDICT r4 #5) runs the worst-case Stable
    Audio edit through the sequence-parallel shard_map attention path on a
    1-chip sp mesh; the row must be labelled so its delta vs the dense row
    reads as the measured sp-machinery overhead."""
    proc = _run({"BENCH_MODELS": "stabilityai/stable-audio-open-1.0:sp1"})
    assert proc.returncode == 0, proc.stderr
    last = _json_lines(proc.stdout)[-1]
    fams = last["detail"]["families"]
    assert [r.get("config") for r in fams] == [
        "sp1_shardmap_worst_case_batch2_cfg"]


def test_backend_down_emits_parseable_empty_line(monkeypatch, capsys):
    """With the axon tunnel down (BENCH_r02's failure mode) the orchestrator
    must print a parseable empty result line and exit 1 instead of letting
    children hang on backend init until the driver kills the run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.delenv("BENCH_FAKE", raising=False)
    monkeypatch.setenv("BENCH_BUDGET_S", "10")
    monkeypatch.setattr(bench, "_backend_alive", lambda timeout_s=1: False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    rc = bench.orchestrate()
    out = capsys.readouterr().out
    line = json.loads([ln for ln in out.splitlines()
                       if ln.strip().startswith("{")][-1])
    assert rc == 1
    assert line["value"] == 0.0 and line["vs_baseline"] == 0.0
    assert "backend unavailable" in line["detail"]["note"]
