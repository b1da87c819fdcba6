#!/usr/bin/env python
"""Op-level attribution from a ``--profile_dir`` trace (VERDICT r4 #3).

Through the axon tunnel the captured trace's device track carries
zero-duration events (PERF_NOTES.md "Other"), so absolute device times are
unavailable — but the trace still names every executed XLA op/thunk on
whichever track is populated, and *relative* shares on a populated track
are valid even when wall time is tunnel-inflated ~10x. This tool

1. loads every ``*.trace.json.gz`` under a profile dir (the Chrome-trace
   sibling of the ``.xplane.pb`` jax.profiler writes),
2. aggregates complete events ("ph":"X") by track and by event name,
3. buckets op names into MXU-matmul / softmax-transcendental / layernorm-
   reduce / rotary-elementwise / copy-layout / other, and prints per-track
   totals + shares, so the measured share can be checked against the DiT
   roofline model (PERF_NOTES.md "DiT roofline": SwiGLU FF ~65% of layer
   FLOPs).

Usage: python tools/trace_attribution.py /tmp/jax_prof [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

# bucket -> regexes matched (search, case-insensitive) against event names.
# XLA fuses aggressively, so fusion names carry their root op: a fusion
# whose name mentions "dot" is an MXU kernel; "exp"/"divide" with "reduce"
# is softmax-shaped, etc. First match wins, order matters.
BUCKETS = [
    ("matmul(MXU)", r"dot|conv|einsum|gemm|matmul"),
    ("softmax", r"softmax|exponential|\bexp\b"),
    ("layernorm/reduce", r"norm|reduce|variance|rsqrt"),
    ("rotary/elementwise", r"rotary|sin|cos|concatenate"),
    ("copy/layout", r"copy|transpose|reshape|bitcast|broadcast|slice|pad"),
    ("infeed/outfeed", r"infeed|outfeed|transfer|h2d|d2h"),
]


def bucket_of(name: str) -> str:
    low = name.lower()
    for bucket, pat in BUCKETS:
        if re.search(pat, low):
            return bucket
    return "other"


def load_traces(profile_dir: str):
    """Yield (path, trace_dict) for every trace.json.gz under profile_dir."""
    paths = sorted(
        glob.glob(os.path.join(profile_dir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    for p in paths:
        with gzip.open(p, "rt") as f:
            yield p, json.load(f)


def analyze(trace: dict):
    """Return {track_name: {event_name: total_us}} for complete events."""
    # pid/tid -> human name from metadata events
    proc = {}
    thread = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                proc[ev["pid"]] = ev["args"].get("name", str(ev["pid"]))
            elif ev.get("name") == "thread_name":
                thread[(ev["pid"], ev.get("tid"))] = ev["args"].get(
                    "name", str(ev.get("tid")))
    tracks = collections.defaultdict(lambda: collections.Counter())
    counts = collections.defaultdict(lambda: collections.Counter())
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        track = f"{proc.get(pid, pid)}/{thread.get((pid, tid), tid)}"
        dur = float(ev.get("dur", 0.0))
        name = ev.get("name", "?")
        tracks[track][name] += dur
        counts[track][name] += 1
    return tracks, counts


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=40,
                    help="top-N events per populated track")
    ap.add_argument("--min_share", type=float, default=0.002,
                    help="hide events below this share of track total")
    args = ap.parse_args(argv)

    found = False
    for path, trace in load_traces(args.profile_dir):
        found = True
        print(f"=== {path}")
        tracks, counts = analyze(trace)
        for track in sorted(tracks, key=lambda t: -sum(tracks[t].values())):
            total = sum(tracks[track].values())
            if total <= 0:
                print(f"--- track {track}: all events zero-duration "
                      f"({sum(counts[track].values())} events) — tunnel "
                      f"device track, no attribution available")
                continue
            print(f"--- track {track}: {total / 1e6:.3f} s total, "
                  f"{sum(counts[track].values())} events")
            bucket_tot = collections.Counter()
            for name, us in tracks[track].items():
                bucket_tot[bucket_of(name)] += us
            for b, us in bucket_tot.most_common():
                print(f"    {b:22s} {us / 1e6:9.3f} s  {us / total:6.1%}")
            print("    top events:")
            for name, us in tracks[track].most_common(args.top):
                if us / total < args.min_share:
                    break
                print(f"      {us / total:6.1%} {us / 1e6:9.3f} s "
                      f"x{counts[track][name]:<6d} {name[:90]}")
    if not found:
        print(f"no *.trace.json.gz under {args.profile_dir}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
