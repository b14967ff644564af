'''Gradient accumulation produces the EXACT full-batch update.

The caption loss is a row-sum normalized by total non-pad tokens, so
accumulating raw (summed-KL) gradients + token counts over microbatches
and normalizing once is mathematically the full-batch gradient — pinned
here: accum_steps=2 and accum_steps=4 produce the same loss and updated
parameters as a single full-batch step (dropout off; with dropout on the
microbatch rng streams legitimately differ).
'''
import numpy as np
import jax
import pytest

from tests.test_drivers import mini_data, _mini_cfg  # noqa: F401

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

PAD = 1
DIMS = CapModelDims(voc_size=20, d_model_A=8, d_model_V=8, d_model_C=16,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=32,
                    dout_p=0.0)


# SGD: the update is linear in the gradient, so full-batch equivalence is
# checkable to reduction-order noise (~1e-7). Adam's first step is
# g/(|g|+eps) — infinitely sensitive where g ~ 0 — which would only test
# noise amplification, not the accumulation math (raw grads were verified
# to agree at ~5e-7).
class _Cfg:
    optimizer = 'sgd'
    lr = 3e-3
    momentum = 0.0
    grad_clip = 1.0
    weight_decay = 0.0


def _batch(rng, B=8, Sv=5, Sa=6, Sc=7):
    src = {
        'rgb': rng.normal(size=(B, Sv, 8)).astype(np.float32),
        'flow': rng.normal(size=(B, Sv, 8)).astype(np.float32),
        'audio': rng.normal(size=(B, Sa, 8)).astype(np.float32),
    }
    captions = np.full((B, Sc), PAD, np.int32)
    captions[:, 0] = 2
    for b in range(B):
        n = 3 + b % 3                     # ragged lengths: unequal token
        captions[b, 1:1 + n] = rng.integers(4, 20, size=n)  # counts per
        captions[b, 1 + n] = 3            # microbatch
    return {'src': src, 'caption': captions}


@pytest.mark.parametrize('accum', [2, 4])
def test_grad_accum_matches_full_batch(accum):
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    optimizer = build_optimizer(_Cfg())
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)

    def run(accum_steps):
        step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, PAD,
                                           accum_steps=accum_steps))
        state = init_train_state(params, optimizer)
        state, metrics = step(state, batch)
        return float(metrics['loss']), state.params

    loss1, params1 = run(1)
    lossk, paramsk = run(accum)
    np.testing.assert_allclose(lossk, loss1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(paramsk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.slow
def test_train_cap_with_grad_accum(mini_data, tmp_path):  # noqa: F811
    '''--grad_accum_steps drives the full captioning trainer end-to-end.'''
    from bmt_tpu.train.cap_trainer import train_cap

    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap')
    cfg.grad_accum_steps = 2
    best = train_cap(cfg)
    assert np.isfinite(best)


def test_grad_accum_with_row_valid_tail():
    '''Accumulation composes with the repeat-padded tail-batch masking.'''
    rng = np.random.default_rng(1)
    full = _batch(rng, B=8)
    tail = {'src': {k: v[:6] for k, v in full['src'].items()},
            'caption': full['caption'][:6]}
    padded = {'src': {k: np.concatenate([v, v[-2:]], 0)
                      for k, v in tail['src'].items()},
              'caption': np.concatenate([tail['caption'],
                                         tail['caption'][-2:]], 0),
              'row_valid': np.arange(8) < 6}

    optimizer = build_optimizer(_Cfg())
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)

    step1 = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, PAD))
    s1 = init_train_state(params, optimizer)
    s1, m1 = step1(s1, tail)

    step2 = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, PAD,
                                        accum_steps=2))
    s2 = init_train_state(params, optimizer)
    s2, m2 = step2(s2, padded)

    np.testing.assert_allclose(float(m2['loss']), float(m1['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.parametrize('accum', [2, 4])
def test_prop_grad_accum_matches_full_batch(accum):
    '''Proposal-stage accumulation is exact: the YOLO masked-mean
    denominators (obj/noobj cell counts) come from a target-only pre-pass
    over the FULL batch, so summed microbatch gradients equal the
    full-batch gradient even though per-microbatch cell counts differ.'''
    from bmt_tpu.models import (PropModelDims,
                                init_multimodal_proposal_generator)
    from bmt_tpu.train.steps import make_prop_train_step
    import jax.numpy as jnp

    pdims = PropModelDims(d_model_A=8, d_model_V=8, d_model=16, H=2, N=1,
                          d_ff_A=16, d_ff_V=16, d_vid=8, d_aud=8,
                          kernel_sizes_A=(3,), kernel_sizes_V=(3, 5),
                          conv_layers_A=(8,), conv_layers_V=(8,),
                          anchors_num_A=2, anchors_num_V=2, dout_p=0.0)
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(2),
                                                pdims)
    params['anchors_A'] = jnp.asarray([2.0, 6.0])
    params['anchors_V'] = jnp.asarray([3.0, 9.0])
    optimizer = build_optimizer(_Cfg())

    rng = np.random.default_rng(1)
    B, E = 8, 3
    batch = {
        'src': {
            'rgb': rng.normal(size=(B, 6, 8)).astype(np.float32),
            'flow': rng.normal(size=(B, 6, 8)).astype(np.float32),
            'audio': rng.normal(size=(B, 7, 8)).astype(np.float32),
        },
        # ragged event counts per row -> unequal obj cells per microbatch
        'centers': rng.uniform(1, 12, size=(B, E)).astype(np.float32),
        'lengths': rng.uniform(1, 6, size=(B, E)).astype(np.float32),
        'valid': (np.arange(E)[None, :]
                  < (1 + np.arange(B)[:, None] % 3)),
    }

    def run(accum_steps):
        step = jax.jit(make_prop_train_step(pdims, optimizer, PAD,
                                            accum_steps=accum_steps))
        state = init_train_state(params, optimizer)
        state, metrics = step(state, batch)
        return float(metrics['loss']), state.params

    loss1, params1 = run(1)
    lossk, paramsk = run(accum)
    np.testing.assert_allclose(lossk, loss1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(paramsk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
