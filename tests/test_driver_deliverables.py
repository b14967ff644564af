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
