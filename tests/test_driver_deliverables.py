'''Regression guards for the driver-facing deliverables: ``bench.py`` must
print one parseable JSON line and ``__graft_entry__.entry()`` must stay
traceable. These are the scoreboard surface — a breakage here is invisible
to the library tests but fails the round.

(dryrun_multichip is covered implicitly: it composes make_mesh /
place_params / make_cap_train_step, each tested in test_parallel /
test_tensor_parallel; running it in-process would pin this interpreter to
a 1-device view, so it is exercised by the driver itself.)
'''
import json
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))


def test_graft_entry_traces():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)   # trace only: no full-size compile
    params, src, trg = args
    B, Sc = trg.shape
    assert out.shape == (B, Sc, 10172), out.shape


@pytest.mark.slow
def test_bench_smoke_prints_one_json_line():
    '''Run the REAL bench script with tiny shape overrides on CPU and check
    the contract the driver relies on: exactly one stdout line, valid JSON,
    with the headline keys.'''
    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               BMT_BENCH_VOC='128', BMT_BENCH_B='2', BMT_BENCH_SA='16',
               BMT_BENCH_SV='8', BMT_BENCH_MAX_LEN='3', BMT_BENCH_ITERS='1',
               BMT_BENCH_REPS='1', BMT_BENCH_TB='2', BMT_BENCH_SC='6',
               BMT_BENCH_PB='1', BMT_BENCH_PSA='16', BMT_BENCH_PSV='8',
               BMT_BENCH_PDM='16')
    # this host's sitecustomize registers the axon TPU plugin whenever this
    # var is set, and a DOWN tunnel then hangs backend init even under
    # JAX_PLATFORMS=cpu — the CPU smoke must not depend on tunnel health
    env.pop('PALLAS_AXON_POOL_IPS', None)
    proc = subprocess.run([sys.executable, 'bench.py'], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    result = json.loads(lines[0])
    for key in ('metric', 'value', 'unit', 'vs_baseline',
                'train_samples_per_sec', 'train_step_ms', 'decode_impl',
                'prop_train_step_ms'):
        assert key in result, (key, result)
    assert result['value'] > 0 and result['vs_baseline'] > 0, result


def test_bench_watchdog_emits_partial_on_stall():
    '''A dead device tunnel blocks inside a C call where signals cannot
    interrupt; the bench watchdog must emit the best PARTIAL result and
    hard-exit so the round still gets a number. Simulated by injecting a
    stall (sitecustomize monkeypatches time.sleep into the decode path via
    a tiny shim module) — here we drive the watchdog directly.'''
    code = r'''
import json, sys, time
sys.path.insert(0, %r)
import bench
bench._RESULT.update({'metric': 'greedy_decode_captions_per_sec_per_chip',
                      'value': 123.0, 'unit': 'captions/sec',
                      'vs_baseline': None, 'partial': True})
import os
os.environ['BMT_BENCH_DEADLINE'] = '1'
bench._start_watchdog()
time.sleep(60)   # simulated stall: the watchdog must kill us first
''' % (REPO,)
    proc = subprocess.run([sys.executable, '-c', code], cwd=REPO,
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, (proc.returncode, proc.stderr[-500:])
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    out = json.loads(lines[0])
    assert out['value'] == 123.0 and out['partial'] is True
    assert 'watchdog' in proc.stderr


def test_bench_watchdog_exits_nonzero_with_no_metrics():
    code = r'''
import sys, time, os
sys.path.insert(0, %r)
import bench
os.environ['BMT_BENCH_DEADLINE'] = '1'
bench._start_watchdog()
time.sleep(60)
''' % (REPO,)
    proc = subprocess.run([sys.executable, '-c', code], cwd=REPO,
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == 3
    assert proc.stdout.strip() == ''


def test_bench_paired_ratio_is_drift_robust():
    '''_paired_ratio must take the median of per-rep ratios — robust to a
    drifting window where a ratio of medians pairs different reps.'''
    import bench

    # variant b is exactly 2x a in every rep, but the window drifts 10x:
    # per-rep pairing recovers 2.0 regardless
    a = [1.0, 2.0, 10.0, 4.0, 0.5]
    b = [2.0, 4.0, 20.0, 8.0, 1.0]
    stats = {'a': (min(a), 2.0, a), 'b': (min(b), 4.0, b)}
    assert bench._paired_ratio(stats, 'b', 'a') == 2.0

    # _time_interleaved returns (best, p50, samples) triples
    calls = iter(range(100))

    def fake(_=calls):
        return 0

    out = bench._time_interleaved({'x': (fake, 1), 'y': (fake, 1)}, 3)
    for name in ('x', 'y'):
        best, p50, samples = out[name]
        assert len(samples) == 3
        assert best == min(samples) and p50 == sorted(samples)[1]


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get('BMT_TEST_DRYRUN', '0') != '1',
                    reason='opt-in (BMT_TEST_DRYRUN=1): ~3-6 min of CPU '
                           'compiles; the round driver runs the dryrun '
                           'directly every round')
def test_dryrun_multichip_subprocess_smoke():
    '''Drive the REAL dryrun deliverable end-to-end in a subprocess
    (4 virtual devices -> dp1 x sp2 x mp2 + the 2-process multihost
    section) and check its OK line.'''
    import subprocess
    import sys

    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=4')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    proc = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__ as g; g.dryrun_multichip(4)'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert 'dryrun_multichip(4) OK' in proc.stdout, proc.stdout
    assert 'multihost=2proc-dp4' in proc.stdout, proc.stdout
