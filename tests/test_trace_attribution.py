"""tools/trace_attribution.py over a synthetic Chrome trace (VERDICT r4 #3)."""

import gzip
import json
import os

from tools.trace_attribution import analyze, bucket_of, main


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def _meta(pid, tid, pname, tname):
    return [
        {"ph": "M", "pid": pid, "name": "process_name",
         "args": {"name": pname}},
        {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
         "args": {"name": tname}},
    ]


def test_bucketing():
    assert bucket_of("fusion.dot.123") == "matmul(MXU)"
    assert bucket_of("loop_convolution_fusion") == "matmul(MXU)"
    assert bucket_of("exponential.7") == "softmax"
    assert bucket_of("reduce_variance_fusion") == "layernorm/reduce"
    assert bucket_of("copy.42") == "copy/layout"
    assert bucket_of("custom-call.9") == "other"


def test_analyze_aggregates_by_track_and_name():
    events = _meta(1, 1, "host", "main") + [
        {"ph": "X", "pid": 1, "tid": 1, "name": "dot.1", "dur": 100.0},
        {"ph": "X", "pid": 1, "tid": 1, "name": "dot.1", "dur": 50.0},
        {"ph": "X", "pid": 1, "tid": 1, "name": "exp.2", "dur": 25.0},
    ]
    tracks, counts = analyze({"traceEvents": events})
    assert tracks["host/main"]["dot.1"] == 150.0
    assert counts["host/main"]["dot.1"] == 2
    assert tracks["host/main"]["exp.2"] == 25.0


def test_main_reports_zero_duration_device_track(tmp_path, capsys):
    """The tunnel's device track is all zero-duration (PERF_NOTES 'Other');
    the tool must say so explicitly rather than print an empty table."""
    events = (
        _meta(1, 1, "/host:CPU", "xla") + _meta(2, 2, "/device:TPU:0", "ops")
        + [
            {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.dot.3",
             "dur": 900.0},
            {"ph": "X", "pid": 1, "tid": 1, "name": "copy.1", "dur": 100.0},
            {"ph": "X", "pid": 2, "tid": 2, "name": "dot.9", "dur": 0.0},
        ]
    )
    run = tmp_path / "plugins" / "profile" / "run1"
    _write_trace(str(run / "host.trace.json.gz"), events)
    assert main([str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "matmul(MXU)" in out and "90.0%" in out
    assert "zero-duration" in out  # the TPU track diagnosis


def test_main_errors_without_traces(tmp_path, capsys):
    assert main([str(tmp_path)]) == 1
    assert "no *.trace.json.gz" in capsys.readouterr().err
