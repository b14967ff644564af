'''Multi-process (DCN-style) dryrun worker + shared fixtures.

Run as ``python -m bmt_tpu.parallel.dryrun_dist`` inside a
``jax.distributed`` process group (env: JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID; each process brings its own virtual
CPU devices via XLA_FLAGS). Used by ``__graft_entry__.dryrun_multichip``
section (9) to exercise the multi-HOST init path — the same
``maybe_init_distributed`` -> cross-process mesh -> grad-psum-over-DCN
route a TPU pod takes — inside the committed driver deliverable, not
just the test suite (tests/test_multiprocess.py is the pytest twin).

The fixtures are deterministic and shared with the parent process so the
cross-process loss can be checked against a single-process run of the
identical step.
'''
from __future__ import annotations

import numpy as np


def dryrun_dims():
    from bmt_tpu.models import CapModelDims
    return CapModelDims(voc_size=64, d_model_A=16, d_model_V=16,
                        d_model_C=16, d_model=32, H=2, N=1, d_ff_A=32,
                        d_ff_V=32, d_ff_C=32)


class OptCfg:
    optimizer = 'adam'
    lr = 1e-3
    grad_clip = 1.0
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def make_batch(B: int = 4):
    rng = np.random.default_rng(42)
    return {
        'src': {
            'rgb': rng.normal(size=(B, 6, 16)).astype(np.float32),
            'flow': rng.normal(size=(B, 6, 16)).astype(np.float32),
            'audio': rng.normal(size=(B, 8, 16)).astype(np.float32),
        },
        'caption': rng.integers(4, 64, size=(B, 7)).astype(np.int32),
    }


def run_step(dp=None):
    '''One deterministic captioning train step; returns (loss, checksum).
    ``dp``: a DataParallel to shard over (cross-process mesh in the
    worker); None runs unsharded single-device.'''
    import jax
    import jax.numpy as jnp
    from bmt_tpu.models import init_bimodal_transformer
    from bmt_tpu.train.optim import build_optimizer
    from bmt_tpu.train.steps import init_train_state, make_cap_train_step

    dims = dryrun_dims()
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    optimizer = build_optimizer(OptCfg())
    raw_step = make_cap_train_step(dims, optimizer, 0.7, 1)
    state = init_train_state(params, optimizer)
    batch = make_batch()
    if dp is None:
        step = jax.jit(raw_step)
    else:
        step = dp.jit_step(raw_step)
        state = state._replace(params=dp.replicate_tree(state.params),
                               opt_state=dp.replicate_tree(state.opt_state))
        batch = dp.shard(batch)
    state, metrics = step(state, batch)
    checksum = float(sum(jnp.sum(jnp.abs(leaf))
                         for leaf in jax.tree.leaves(state.params)))
    return float(metrics['loss']), checksum


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from bmt_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()   # workers share the repo's persistent cache
    from bmt_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    # 2 virtual devices per process (XLA_FLAGS set by the parent)
    assert jax.device_count() == 4, jax.device_count()

    from bmt_tpu.parallel import DataParallel
    dp = DataParallel()   # dp4 mesh spanning both processes
    assert dp.n_dp == 4
    loss, checksum = run_step(dp)
    print(f'RESULT {loss:.8f} {checksum:.8f}', flush=True)


if __name__ == '__main__':
    main()
