'''Tracing / profiling hooks (the reference has only wall-clock prints —
captioning_utils.py:33-42; here: jax.profiler traces + step timers).'''
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    '''Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)
    around the enclosed block. No-op when log_dir is None.'''
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    '''Rolling per-step wall-clock stats with device sync on demand.'''

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None and self.count % self.sync_every == 0:
            jax.block_until_ready(result)
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total / max(self.count, 1)


def annotate(name: str):
    '''Named trace region (shows up in the profiler timeline).'''
    return jax.profiler.TraceAnnotation(name)


# ---------------------------------------------------------------------------
# HLO traffic census
# ---------------------------------------------------------------------------

_HLO_DTYPE_BYTES = {
    'f64': 8, 'u64': 8, 's64': 8, 'f32': 4, 's32': 4, 'u32': 4,
    'bf16': 2, 'f16': 2, 'u16': 2, 's16': 2, 's8': 1, 'u8': 1, 'pred': 1,
}
# ops whose "output" is bookkeeping, not a materialized HBM buffer
_HLO_FREE_OPS = frozenset({'parameter', 'constant', 'get-tuple-element',
                           'tuple', 'bitcast', 'after-all'})


def hlo_traffic_census(compiled_or_text, top: int = 15) -> dict:
    '''Rank a compiled program's materialized buffers by bytes.

    This is the tool behind docs/DESIGN.md §6b's bandwidth accounting:
    on a memory-bound step, "where do the bytes go" IS the profile, and
    the optimized HLO names every buffer with the source line that
    produced it. It caught dropout's unfused uint32 bit tensors (+ their
    layout copies) as the train forward's largest line item — invisible
    to both FLOP counting and isolated microbenchmarks (in isolation the
    rng chain fuses; in the full program it materializes).

    Takes a ``jax.stages.Compiled`` (``jit_fn.lower(*args).compile()``)
    or an optimized-HLO string. Returns {'total_bytes', 'by_op',
    'by_source', 'top'} where by_op/by_source map op-kind / "file:line"
    to summed output bytes of the ENTRY computation's materialized
    instructions, and 'top' lists the ``top`` largest single buffers as
    (bytes, op, source, name).
    '''
    import re

    text = (compiled_or_text if isinstance(compiled_or_text, str)
            else compiled_or_text.as_text())
    shape_re = re.compile(
        r'\b(' + '|'.join(_HLO_DTYPE_BYTES) + r')\[([0-9,]*)\]')
    inst_re = re.compile(r'^\s+(?:ROOT )?%([\w\.\-]+) = (.*?) (\w[\w\-]*)\(')
    meta_re = re.compile(r'source_file="([^"]+)" source_line=(\d+)')

    def nbytes(shapes: str) -> int:
        total = 0
        for dt, ds in shape_re.findall(shapes):
            n = 1
            for d in ds.split(','):
                if d:
                    n *= int(d)
            total += n * _HLO_DTYPE_BYTES[dt]
        return total

    lines = text.splitlines()
    try:
        start = next(i for i, ln in enumerate(lines)
                     if ln.startswith('ENTRY'))
    except StopIteration:
        raise ValueError('no ENTRY computation in HLO text') from None
    rows = []
    for ln in lines[start + 1:]:
        if ln.startswith('}'):
            break
        m = inst_re.match(ln)
        if not m:
            continue
        name, shapes, op = m.groups()
        if op in _HLO_FREE_OPS:
            continue
        mm = meta_re.search(ln)
        src = (f'{mm.group(1).rsplit("/", 1)[-1]}:{mm.group(2)}'
               if mm else '?')
        rows.append((nbytes(shapes), op, src, name))
    by_op: dict = {}
    by_source: dict = {}
    for b, op, src, _ in rows:
        by_op[op] = by_op.get(op, 0) + b
        by_source[src] = by_source.get(src, 0) + b
    rows.sort(reverse=True)
    return {
        'total_bytes': sum(r[0] for r in rows),
        'by_op': dict(sorted(by_op.items(), key=lambda kv: -kv[1])),
        'by_source': dict(sorted(by_source.items(), key=lambda kv: -kv[1])),
        'top': rows[:top],
    }


def trace_device_ms_per_exec(trace_dir: str, n_execs: int) -> float:
    '''Parse a ``trace(trace_dir)`` capture: summed duration of the
    jit-program envelope events / ``n_execs`` -> DEVICE milliseconds per
    execution. This separates the executable's true cost from host and
    tunnel overhead (wall / device = the host's duty-cycle factor) — the
    instrument behind docs/DESIGN.md §6b's device table and bench.py's
    ``train_device_step_ms`` / ``train_mfu_device`` fields. Raises if
    the trace holds no program events (e.g. profiling unsupported).'''
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(trace_dir + '/**/*.trace.json.gz',
                             recursive=True))
    if not files:
        raise FileNotFoundError(f'no trace.json.gz under {trace_dir}')
    data = json.loads(gzip.open(files[-1]).read())
    envs: dict = collections.Counter()
    for e in data.get('traceEvents', []):
        name = e.get('name', '')
        if e.get('ph') == 'X' and (name.startswith('jit_')
                                   or name.startswith('jit(')):
            envs[name] += e.get('dur', 0)
    if not envs:
        raise ValueError(f'no jit program events in {files[-1]}')
    return max(envs.values()) / 1e3 / n_execs


def trace_device_ms_by_source(trace_dir: str, compiled_or_text) -> dict:
    '''Join a profiler trace's per-fusion device durations with the
    compiled program's HLO source metadata: {source "file:line": device
    ms} — a device-TIME flame view to pair with ``hlo_traffic_census``'s
    byte view (bytes say what SHOULD dominate a bandwidth-bound program;
    this says what DID). Instructions whose HLO carries no source
    metadata (rng, layout copies, runtime staging) bucket by opcode
    instead: '?:rng-bit-generator', '?:copy', '?:fusion', ...

    ``compiled_or_text``: the SAME program the trace captured
    (``jit_fn.lower(...).compile()`` or its ``as_text()``); instruction
    names are matched exactly, so a recompiled/different program simply
    attributes little — check coverage against
    ``trace_device_ms_per_exec``.'''
    import collections
    import glob
    import gzip
    import json
    import re

    text = (compiled_or_text if isinstance(compiled_or_text, str)
            else compiled_or_text.as_text())
    src_of = {}
    meta_re = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
    inst_re = re.compile(r'^\s+(?:ROOT )?%([\w\.\-]+) = .*?\]\S* (\w[\w\-]*)\(')
    for ln in text.splitlines():
        m = inst_re.match(ln)
        if not m:
            continue
        mm = meta_re.search(ln)
        # metadata-less instructions bucket by HLO opcode ('?:copy',
        # '?:rng-bit-generator', ...) so the residue is still named
        src_of[m.group(1)] = (
            f'{mm.group(1).rsplit("/", 1)[-1]}:{mm.group(2)}'
            if mm else f'?:{m.group(2)}')

    files = sorted(glob.glob(trace_dir + '/**/*.trace.json.gz',
                             recursive=True))
    if not files:
        raise FileNotFoundError(f'no trace.json.gz under {trace_dir}')
    data = json.loads(gzip.open(files[-1]).read())
    by_src: dict = collections.Counter()
    for e in data.get('traceEvents', []):
        name = e.get('name', '')
        # device op events carry the bare HLO instruction name; exact
        # match against the program's instruction table is the filter
        # (host frames, program envelopes, runtime markers don't match)
        if e.get('ph') == 'X' and name in src_of:
            by_src[src_of[name]] += e.get('dur', 0)
    return {k: v / 1e3
            for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])}
