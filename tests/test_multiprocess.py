'''Multi-HOST data parallelism smoke test: two real OS processes, one CPU
device each, joined by jax.distributed (gloo CPU collectives) into a single
2-device mesh — the same code path a TPU pod takes over DCN
(maybe_init_distributed -> DataParallel -> jit_step with the grad psum
spanning processes).

Asserts the cross-process train step produces the SAME loss and updated
parameters as a single-process run on the identical batch.
'''
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _single_process_reference():
    import jax
    import jax.numpy as jnp
    from bmt_tpu.models import init_bimodal_transformer
    from bmt_tpu.train.optim import build_optimizer
    from bmt_tpu.train.steps import init_train_state, make_cap_train_step
    from tests.dist_common import DIMS, OptCfg, make_batch

    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    optimizer = build_optimizer(OptCfg())
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, 1))
    state = init_train_state(params, optimizer)
    state, metrics = step(state, make_batch())
    checksum = float(sum(jnp.sum(jnp.abs(leaf))
                         for leaf in jax.tree.leaves(state.params)))
    return float(metrics['loss']), checksum


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update({
        'JAX_PLATFORMS': 'cpu',
        'JAX_COORDINATOR_ADDRESS': f'127.0.0.1:{port}',
        'JAX_NUM_PROCESSES': '2',
        'PYTHONPATH': REPO,
        'BMT_TEST_CKPT_DIR': str(tmp_path / 'dist_ckpt'),
    })
    env.pop('XLA_FLAGS', None)  # 1 local device per process

    procs = []
    for pid in range(2):
        penv = dict(env, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'tests', 'dist_worker.py')],
            env=penv, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO))

    results, orbax_sums, async_sums = [], [], []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f'worker failed:\n{err[-3000:]}'
        line = [ln for ln in out.splitlines() if ln.startswith('RESULT')][-1]
        _, loss, checksum = line.split()
        results.append((float(loss), float(checksum)))
        oline = [ln for ln in out.splitlines() if ln.startswith('ORBAX')][-1]
        orbax_sums.append(float(oline.split()[1]))
        aline = [ln for ln in out.splitlines() if ln.startswith('ASYNC')][-1]
        async_sums.append(float(aline.split()[1]))

    # both processes observe the identical replicated state
    assert results[0] == results[1]

    # the collective orbax save/restore round-trips the trained params on
    # BOTH processes (multi-process array writes + meta sidecar)
    for osum, (_, checksum) in zip(orbax_sums, results):
        np.testing.assert_allclose(osum, checksum, rtol=1e-6)

    # the ASYNC writer's cross-process rolling save round-trips too
    # (state2 == state after the identical step, so the same checksum)
    for asum, (_, checksum) in zip(async_sums, results):
        np.testing.assert_allclose(asum, checksum, rtol=1e-6)

    ref_loss, ref_checksum = _single_process_reference()
    np.testing.assert_allclose(results[0][0], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], ref_checksum, rtol=1e-5)
