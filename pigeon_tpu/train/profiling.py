"""Profiling utilities: capture + summarize TPU traces.

Wraps `jax.profiler` (the TPU-native counterpart of the reference's
torch.profiler/TensorBoard flow, `training/train_eval_loop.py:21-33`) and
adds a dependency-free trace summarizer so hot ops are visible without a
TensorBoard/XProf round-trip — on this environment the tunnel makes the
XProf UI impractical, and the summarizer answers the first question
("where did the step time go?") directly.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Callable, Dict, List, Optional, Tuple


def capture_trace(fn: Callable, trace_dir: str, steps: int = 3) -> str:
    """Run `fn()` `steps` times under a jax profiler trace.

    Each call should synchronize itself (e.g. read back a scalar — note
    `block_until_ready` is a no-op through the axon tunnel).

    Returns the trace directory (TensorBoard-loadable; also summarizable
    with :func:`summarize_trace`).
    """
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        for _ in range(steps):
            fn()
    finally:
        jax.profiler.stop_trace()
    return trace_dir


def _load_events(trace_dir: str) -> List[dict]:
    pattern = os.path.join(trace_dir, "plugins", "profile", "*",
                           "*.trace.json.gz")
    paths = sorted(glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no trace files under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    return [e for e in data.get("traceEvents", [])
            if e.get("ph") == "X" and e.get("dur")]


#: Host-side bookkeeping event names to exclude from device summaries.
_HOST_MARKERS = ("__float__", "profiler.py", "np.asarray", "_value",
                 "wrapper", "stop_trace", "jit_")


def summarize_trace(trace_dir: str, top: int = 15,
                    include_host: bool = False) -> List[Tuple[str, float, float]]:
    """Aggregate trace events by op name.

    Returns ``[(name, total_ms, percent), ...]`` sorted by time; by default
    host-side sync/bookkeeping events are excluded so percentages reflect
    device work.
    """
    events = _load_events(trace_dir)
    agg: Dict[str, float] = collections.Counter()
    for e in events:
        name = e["name"]
        if not include_host and any(m in name for m in _HOST_MARKERS):
            continue
        agg[name] += e["dur"]
    total = sum(agg.values()) or 1.0
    return [(name, dur / 1e3, 100.0 * dur / total)
            for name, dur in collections.Counter(agg).most_common(top)]


def print_trace_summary(trace_dir: str, top: int = 15) -> None:
    rows = summarize_trace(trace_dir, top)
    total = sum(r[1] for r in rows)
    print(f"device op-time (top {top}, {total:.1f} ms total):")
    for name, ms, pct in rows:
        print(f"  {ms:9.1f} ms  {pct:5.1f}%  {name[:80]}")
