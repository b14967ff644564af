'''Worker process for the 2-process jax.distributed smoke test
(tests/test_multiprocess.py). Runs one data-parallel captioning train step
over a mesh that spans BOTH processes (1 CPU device each, gloo collectives)
and prints the loss + a parameter checksum for the test to compare.'''
import sys

import jax

jax.config.update('jax_platforms', 'cpu')

from bmt_tpu.parallel.mesh import maybe_init_distributed  # noqa: E402

maybe_init_distributed()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bmt_tpu.models import CapModelDims, init_bimodal_transformer  # noqa: E402
from bmt_tpu.parallel import DataParallel  # noqa: E402
from bmt_tpu.train.optim import build_optimizer  # noqa: E402
from bmt_tpu.train.steps import init_train_state, make_cap_train_step  # noqa: E402
from tests.dist_common import DIMS, OptCfg, make_batch  # noqa: E402


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()

    batch = make_batch()
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    optimizer = build_optimizer(OptCfg())

    dp = DataParallel()  # mesh over the two cross-process devices
    assert dp.n_dp == 2
    step = dp.jit_step(make_cap_train_step(DIMS, optimizer, 0.7, 1))
    state = init_train_state(params, optimizer)
    state = state._replace(params=dp.replicate_tree(state.params),
                           opt_state=dp.replicate_tree(state.opt_state))

    state, metrics = step(state, dp.shard(batch))
    loss = float(metrics['loss'])
    checksum = float(sum(jnp.sum(jnp.abs(leaf))
                         for leaf in jax.tree.leaves(state.params)))
    print(f'RESULT {loss:.8f} {checksum:.8f}', flush=True)

    # per-host sharded input pipeline: each process owns a contiguous dp
    # row block of the global batch; zeroing every OTHER process's rows
    # before shard() must be invisible (device_put only transfers this
    # process's addressable shards) — the exact contract the captioning
    # loader's local_rows IO skip relies on
    lr = dp.local_rows(4)
    assert lr == ((0, 2) if jax.process_index() == 0 else (2, 4)), lr
    batch2 = make_batch()
    for m, arr in batch2['src'].items():
        arr = arr.copy()
        arr[:lr[0]] = 0.0
        arr[lr[1]:] = 0.0
        batch2['src'][m] = arr
    state2 = init_train_state(params, optimizer)
    state2 = state2._replace(params=dp.replicate_tree(state2.params),
                             opt_state=dp.replicate_tree(state2.opt_state))
    state2, metrics2 = step(state2, dp.shard(batch2))
    assert float(metrics2['loss']) == loss, (float(metrics2['loss']), loss)
    checksum2 = float(sum(jnp.sum(jnp.abs(leaf))
                          for leaf in jax.tree.leaves(state2.params)))
    assert checksum2 == checksum, (checksum2, checksum)

    # orbax COLLECTIVE save across both processes (the pod code path:
    # every process participates in the array writes, process 0 writes the
    # meta sidecar), then a restore that must reproduce the params
    import os
    ckpt_dir = os.environ.get('BMT_TEST_CKPT_DIR')
    if ckpt_dir:
        from bmt_tpu.train.checkpoint import (load_checkpoint_orbax,
                                              save_checkpoint_orbax)
        save_checkpoint_orbax(ckpt_dir, state.params,
                              {'epoch': 0, 'loss': loss},
                              name='dist_cap_model')
        template = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype),
                                jax.device_get(state.params))
        restored, meta, _ = load_checkpoint_orbax(ckpt_dir, template,
                                                  name='dist_cap_model')
        assert meta['epoch'] == 0
        rsum = float(sum(np.abs(np.asarray(leaf)).sum()
                         for leaf in jax.tree.leaves(restored)))
        print(f'ORBAX {rsum:.8f}', flush=True)

        # --async_ckpt's orbax path across BOTH processes: the array
        # commits are collective (every process participates through
        # orbax's AsyncCheckpointer), the side-dir swap + meta land on
        # process 0's finalizer, close() drains. A rolling re-save of the
        # same name exercises the finalize-join + swap while the previous
        # save's dirs are live.
        from jax.experimental import multihost_utils

        from bmt_tpu.train.checkpoint import AsyncOrbaxWriter
        w = AsyncOrbaxWriter()
        w.save(ckpt_dir, state.params, {'epoch': 1}, state.opt_state,
               name='dist_async_model')
        w.save(ckpt_dir, state2.params, {'epoch': 2}, state2.opt_state,
               name='dist_async_model')
        w.close()
        # close() returning on THIS process does not mean process 0's
        # finalizer swapped yet; readers synchronize before restoring
        # (production resumes restart the whole job, which implies this)
        multihost_utils.sync_global_devices('async-ckpt-durable')
        arestored, ameta, _ = load_checkpoint_orbax(
            ckpt_dir, template, name='dist_async_model')
        assert ameta['epoch'] == 2, ameta
        asum = float(sum(np.abs(np.asarray(leaf)).sum()
                         for leaf in jax.tree.leaves(arestored)))
        print(f'ASYNC {asum:.8f}', flush=True)


if __name__ == '__main__':
    sys.exit(main())
