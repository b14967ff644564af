'''Observability subsystems: MetricsLogger (TB + JSONL), jax.profiler
trace capture, step timer, trace annotations (SURVEY §5 tracing row).'''
import json
import os

import jax
import jax.numpy as jnp

from bmt_tpu.utils.logging import MetricsLogger, NullLogger
from bmt_tpu.utils.profiling import StepTimer, annotate, trace


def test_metrics_logger_writes_tb_and_jsonl(tmp_path):
    log = MetricsLogger(str(tmp_path))
    log.add_scalar('debug/loss_epoch', 1.5, 0)
    log.add_scalar('metrics/meteor', 10.9, 1)
    log.close()

    files = os.listdir(tmp_path)
    # TensorBoard event file (torch.utils.tensorboard is in the image)
    assert any(f.startswith('events.out.tfevents') for f in files), files
    with open(tmp_path / 'metrics.jsonl') as f:
        rows = [json.loads(ln) for ln in f]
    assert rows[0]['tag'] == 'debug/loss_epoch'
    assert rows[0]['value'] == 1.5 and rows[0]['step'] == 0
    assert rows[1]['tag'] == 'metrics/meteor'


def test_metrics_logger_appends_across_resume(tmp_path):
    '''A resumed run must append to the JSONL, not truncate the history.'''
    log = MetricsLogger(str(tmp_path))
    log.add_scalar('a', 1.0, 0)
    log.close()
    log2 = MetricsLogger(str(tmp_path))
    log2.add_scalar('a', 2.0, 1)
    log2.close()
    with open(tmp_path / 'metrics.jsonl') as f:
        assert len(f.readlines()) == 2


def test_null_logger_is_inert(tmp_path):
    log = NullLogger()
    log.add_scalar('x', 1.0, 0)     # no-op, no files, no crash
    log.close()
    assert os.listdir(tmp_path) == []


def test_profiler_trace_capture(tmp_path):
    '''trace() wraps jax.profiler and produces an on-disk trace the
    --profile_steps flag relies on; None is a no-op.'''
    with trace(str(tmp_path)):
        with annotate('test-region'):
            jnp.square(jnp.arange(8.0)).block_until_ready()
    # a plugins/profile/<ts>/ tree with at least one trace artifact
    prof_root = tmp_path / 'plugins' / 'profile'
    assert prof_root.is_dir()
    runs = list(prof_root.iterdir())
    assert runs and any(runs[0].iterdir())

    with trace(None):               # disabled path: no-op
        pass


def test_step_timer_counts_and_syncs():
    t = StepTimer(sync_every=2)
    for i in range(4):
        t.start()
        out = jnp.sum(jnp.ones((16,)))
        t.stop(out)
    assert t.count == 4
    assert t.mean_ms >= 0.0


def test_hlo_traffic_census_ranks_buffers():
    '''hlo_traffic_census (the DESIGN 6b bandwidth-accounting tool) parses
    a compiled program's ENTRY computation, attributes materialized bytes
    to op kinds and source lines, and ranks the largest buffers.'''
    import jax
    import jax.numpy as jnp

    from bmt_tpu.utils.profiling import hlo_traffic_census

    def f(x, w):
        h = jnp.tanh(x @ w)          # materialized activation
        return h @ w.T

    c = jax.jit(f).lower(jnp.ones((32, 64), jnp.float32),
                         jnp.ones((64, 64), jnp.float32)).compile()
    census = hlo_traffic_census(c, top=5)
    assert census['total_bytes'] > 0
    assert census['by_op'] and census['by_source']
    # totals are consistent
    assert sum(census['by_op'].values()) == census['total_bytes']
    assert sum(census['by_source'].values()) == census['total_bytes']
    assert len(census['top']) <= 5
    b, op, src, name = census['top'][0]
    assert b > 0 and isinstance(op, str) and isinstance(name, str)
    # free ops (parameters, tuples, bitcasts) never counted
    assert not set(census['by_op']) & {'parameter', 'tuple', 'bitcast'}
    # text input works too
    census2 = hlo_traffic_census(c.as_text())
    assert census2['total_bytes'] == census['total_bytes']


def test_trace_device_ms_per_exec_parses_envelope(tmp_path):
    '''trace_device_ms_per_exec: picks the largest jit-program envelope
    from a trace capture and divides by exec count; raises cleanly on
    empty/missing traces.'''
    import gzip
    import json

    import pytest

    from bmt_tpu.utils.profiling import trace_device_ms_per_exec

    d = tmp_path / 'plugins' / 'profile' / 'run1'
    d.mkdir(parents=True)
    events = [
        {'ph': 'X', 'name': 'jit_step(123)', 'dur': 9000},   # us
        {'ph': 'X', 'name': 'jit_step(123)', 'dur': 9000},
        {'ph': 'X', 'name': 'jit_helper(9)', 'dur': 100},
        {'ph': 'X', 'name': '$host_frame', 'dur': 99999},    # ignored
        {'ph': 'M', 'name': 'jit_step(123)'},                # not X
    ]
    with gzip.open(d / 'vm.trace.json.gz', 'wt') as f:
        json.dump({'traceEvents': events}, f)
    # two execs of 9 ms each -> 9.0 ms/exec (the helper is not the max)
    assert trace_device_ms_per_exec(str(tmp_path), 2) == 9.0

    with pytest.raises(FileNotFoundError):
        trace_device_ms_per_exec(str(tmp_path / 'nope'), 1)
    empty = tmp_path / 'empty' / 'p'
    empty.mkdir(parents=True)
    with gzip.open(empty / 'x.trace.json.gz', 'wt') as f:
        json.dump({'traceEvents': [{'ph': 'X', 'name': '$h', 'dur': 5}]}, f)
    with pytest.raises(ValueError):
        trace_device_ms_per_exec(str(tmp_path / 'empty'), 1)


def test_epoch_loop_profile_writes_trace_and_device_summary(tmp_path,
                                                           capfd):
    '''--profile_steps: the cap epoch loop captures a jax trace of the
    first N steps and prints a traced-device-ms summary (best-effort;
    on backends whose traces lack program events it says so instead of
    failing the epoch).'''
    import jax
    import numpy as np

    from tests.test_grad_accum import PAD, _batch
    from tests.test_multistep import _Cfg, _dims_with_dropout
    from bmt_tpu.models import init_bimodal_transformer
    from bmt_tpu.train.loops import train_epoch_cap
    from bmt_tpu.train.optim import build_optimizer
    from bmt_tpu.train.steps import init_train_state, make_cap_train_step

    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(3)]
    dims = _dims_with_dropout()
    optimizer = build_optimizer(_Cfg())
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    step = jax.jit(make_cap_train_step(dims, optimizer, 0.7, PAD))
    state = init_train_state(params, optimizer)

    class FakeDataset:
        batch_size = 8

        def batches(self, epoch=0, seed=0, **kw):
            for i, b in enumerate(batches):
                yield dict(b, video_ids=[f'v{i}_{r}' for r in range(8)])

    prof_dir = tmp_path / 'prof'
    state, loss = train_epoch_cap(step, state, FakeDataset(), epoch=0,
                                  profile_steps=2,
                                  profile_dir=str(prof_dir))
    assert np.isfinite(loss)
    # a capture landed on disk
    assert any(prof_dir.rglob('*.xplane.pb')) or \
        any(prof_dir.rglob('*.trace.json.gz')), list(prof_dir.rglob('*'))
    err = capfd.readouterr().err
    assert '[profile]' in err, err


def test_trace_device_ms_by_source_joins_hlo_metadata(tmp_path):
    '''trace_device_ms_by_source: joins per-fusion trace durations with
    the HLO's source metadata into {file:line: device ms} (99% of the
    train step's device time attributes on the real chip — DESIGN 6b).'''
    import gzip
    import json

    from bmt_tpu.utils.profiling import trace_device_ms_by_source

    hlo = '\n'.join([
        'HloModule m',
        'ENTRY %main (p: f32[4]) -> f32[4] {',
        '  %fusion.1 = f32[4]{0} fusion(%p), metadata={op_name="x" '
        'source_file="/repo/a/layers.py" source_line=57}',
        '  %fusion.2 = f32[4]{0} fusion(%fusion.1), '
        'metadata={op_name="y" source_file="/repo/b/attention.py" '
        'source_line=89}',
        '  ROOT %copy.9 = f32[4]{0} copy(%fusion.2)',
        '}',
    ])
    d = tmp_path / 'plugins' / 'profile' / 'r'
    d.mkdir(parents=True)
    events = [
        {'ph': 'X', 'name': 'fusion.1', 'dur': 3000},
        {'ph': 'X', 'name': 'fusion.1', 'dur': 3000},   # two execs
        {'ph': 'X', 'name': 'fusion.2', 'dur': 1000},
        {'ph': 'X', 'name': 'copy.9', 'dur': 500},      # no metadata -> ?
        {'ph': 'X', 'name': 'jit_main(1)', 'dur': 99999},   # envelope: no match
        {'ph': 'X', 'name': '$host', 'dur': 12345},         # host frame
    ]
    with gzip.open(d / 'vm.trace.json.gz', 'wt') as f:
        json.dump({'traceEvents': events}, f)
    by = trace_device_ms_by_source(str(tmp_path), hlo)
    assert by == {'layers.py:57': 6.0, 'attention.py:89': 1.0,
                  '?:copy': 0.5}
    # ordering: largest first
    assert list(by) == ['layers.py:57', 'attention.py:89', '?:copy']
