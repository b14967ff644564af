'''EMA weights (--ema_decay): the train step maintains
e <- d*e + (1-d)*p after each update; validation and best_* checkpoints
use the EMA tree while raw weights keep training; resume restores the
EMA sidecar exactly.'''
import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

DIMS = CapModelDims(voc_size=32, d_model_A=8, d_model_V=8, d_model_C=8,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=16,
                    dout_p=0.0)


class _Cfg:
    optimizer = 'adam'
    lr = 1e-2
    grad_clip = None
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def _batch(rng, B=4):
    return {
        'src': {
            'rgb': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'flow': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'audio': rng.normal(size=(B, 6, 8)).astype(np.float32),
        },
        'caption': rng.integers(4, 32, size=(B, 6)).astype(np.int32),
    }


def test_ema_matches_manual_recurrence(rng):
    d = 0.9
    optimizer = build_optimizer(_Cfg())
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, 1,
                                       ema_decay=d))
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    state = init_train_state(params, optimizer, ema=True)
    # ema seeded as a copy of params
    for e, p in zip(jax.tree.leaves(state.ema), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    batch = _batch(rng)
    manual = jax.tree.map(np.asarray, params)
    for _ in range(3):
        state, _ = step(state, batch)
        manual = jax.tree.map(
            lambda e, p: e * d + np.asarray(p) * (1 - d),
            manual, state.params)
    for e, m in zip(jax.tree.leaves(state.ema), jax.tree.leaves(manual)):
        np.testing.assert_allclose(np.asarray(e), m, rtol=2e-6, atol=1e-7)
    # raw params moved away from the EMA (the trees genuinely differ)
    diffs = [float(np.abs(np.asarray(e) - np.asarray(p)).max())
             for e, p in zip(jax.tree.leaves(state.ema),
                             jax.tree.leaves(state.params))]
    assert max(diffs) > 0


def test_ema_off_is_none_and_structure_compatible(rng):
    '''Default (ema off): state.ema is None — an EMPTY pytree subtree, so
    existing checkpoint templates and jit paths see the same structure.'''
    optimizer = build_optimizer(_Cfg())
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    s_off = init_train_state(params, optimizer)
    assert s_off.ema is None
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, 1))
    s2, _ = step(s_off, _batch(rng))
    assert s2.ema is None
