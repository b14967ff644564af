'''Multi-step dispatch bundling (train.steps.make_multistep).

K optimizer steps scanned inside one compiled dispatch must be
BIT-IDENTICAL to K sequential dispatches: the scan body is the single
step function, and the per-step RNG folds ``state.step`` which advances
inside the scan exactly as it does across calls (threefry keys are
bit-stable across compilations, so the comparison is exact, dropout ON).

Also covered: the epoch-loop integration (tail shorter than a bundle
falls back to single-step dispatches; loss accounting matches), the
dp-sharded bundled input placement, and the trainer flag end-to-end.
'''
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_drivers import mini_data, _mini_cfg  # noqa: F401
from tests.test_grad_accum import _batch, PAD, DIMS

from bmt_tpu.models import init_bimodal_transformer
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import (init_train_state, make_cap_train_step,
                                 make_multistep)


class _Cfg:
    optimizer = 'adam'
    lr = 1e-3
    beta1 = 0.9
    beta2 = 0.999
    eps = 1e-8
    grad_clip = 1.0
    weight_decay = 0.0


def _dims_with_dropout():
    import dataclasses
    return dataclasses.replace(DIMS, dout_p=0.1)


def _stacked(batches):
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def _make(k_batches=4, seed=0):
    rng = np.random.default_rng(seed)
    batches = [_batch(rng) for _ in range(k_batches)]
    dims = _dims_with_dropout()
    optimizer = build_optimizer(_Cfg())
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    step = make_cap_train_step(dims, optimizer, 0.7, PAD)
    state = init_train_state(params, optimizer)  # threefry: bit-stable
    return batches, step, state


def test_multistep_bitwise_matches_sequential():
    batches, step, state0 = _make()

    jstep = jax.jit(step)
    seq_state = state0
    seq_losses = []
    for b in batches:
        seq_state, m = jstep(seq_state, b)
        seq_losses.append(float(m['loss']))

    bundled = jax.jit(make_multistep(step))
    bun_state, metrics = bundled(state0, _stacked(batches))

    # stacked per-step metrics == the sequence of single-step metrics
    np.testing.assert_array_equal(np.asarray(metrics['loss']),
                                  np.asarray(seq_losses, np.float32))
    assert int(bun_state.step) == int(seq_state.step) == len(batches)
    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(bun_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(seq_state.opt_state),
                    jax.tree.leaves(bun_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multistep_dp_sharded_matches_sequential_dp():
    '''Bundled dispatch under a dp mesh (stacked batch placement +
    stacked jit shardings) is bit-identical to sequential dp dispatches
    on the same mesh.'''
    from bmt_tpu.parallel import DataParallel
    batches, step, state0 = _make()
    dp = DataParallel(4)

    jstep = dp.jit_step(step)
    seq_state = dp.replicate_tree(state0)
    for b in batches:
        seq_state, _ = jstep(seq_state, dp.shard(b))

    bundled = dp.jit_step(make_multistep(step), stacked=True)
    bun_state, metrics = bundled(dp.replicate_tree(state0),
                                 dp.shard_stacked(_stacked(batches)))
    assert metrics['loss'].shape == (len(batches),)
    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(bun_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_loop_bundles_with_tail_fallback():
    '''train_epoch_cap with steps_per_dispatch=4 over 6 batches: one
    bundle + a 2-batch single-step tail; final state and mean loss match
    the unbundled loop bitwise.'''
    from bmt_tpu.train.loops import train_epoch_cap

    batches, step, state0 = _make(k_batches=6)

    class FakeDataset:
        batch_size = 8

        def batches(self, epoch=0, seed=0, **kw):
            for i, b in enumerate(batches):
                yield dict(b, video_ids=[f'v{i}_{r}' for r in range(8)])

    jstep = jax.jit(step)
    plain_state, plain_loss = train_epoch_cap(
        jstep, state0, FakeDataset(), epoch=0)

    bundled = jax.jit(make_multistep(step))
    bun_state, bun_loss = train_epoch_cap(
        jstep, state0, FakeDataset(), epoch=0,
        multistep=bundled, steps_per_dispatch=4)

    # per-step losses are bitwise identical (test above); the epoch MEAN
    # may differ in fp32 summation order (bundle sums a (4,) stack, the
    # plain loop adds sequentially)
    assert np.isclose(plain_loss, bun_loss, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(plain_state.params),
                    jax.tree.leaves(bun_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multistep_composes_with_accum_and_ema():
    '''Bundling scans whatever step it is given: a step with grad
    accumulation (inner scan) and EMA threads through the outer scan
    unchanged — bundled == sequential bitwise for the composed step.'''
    rng = np.random.default_rng(1)
    batches = [_batch(rng) for _ in range(2)]
    dims = _dims_with_dropout()
    optimizer = build_optimizer(_Cfg())
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    step = make_cap_train_step(dims, optimizer, 0.7, PAD, accum_steps=2,
                               ema_decay=0.99)
    state0 = init_train_state(params, optimizer, ema=True)

    jstep = jax.jit(step)
    seq_state = state0
    for b in batches:
        seq_state, _ = jstep(seq_state, b)

    bun_state, _ = jax.jit(make_multistep(step))(state0, _stacked(batches))
    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(bun_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(seq_state.ema),
                    jax.tree.leaves(bun_state.ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_cap_steps_per_dispatch(mini_data, tmp_path):  # noqa: F811
    '''--steps_per_dispatch drives the full captioning trainer.'''
    from bmt_tpu.train.cap_trainer import train_cap

    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap', steps_per_dispatch=2)
    best = train_cap(cfg)
    assert best >= 0


@pytest.mark.slow
def test_train_prop_steps_per_dispatch(mini_data, tmp_path):  # noqa: F811
    '''--steps_per_dispatch drives the full proposal trainer.'''
    from bmt_tpu.train.prop_trainer import train_prop

    cfg = _mini_cfg(mini_data, tmp_path, 'train_prop', steps_per_dispatch=2)
    best = train_prop(cfg)
    assert best is not None
