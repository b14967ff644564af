'''Frozen-subtree gradient pruning (train/steps.py:_freeze_prune).

With a frozen_mask, the train steps stop_gradient the frozen leaves inside
the loss, so AD never emits their dW GEMMs / embedding scatter-adds — the
backward gets cheaper for LoRA finetuning and for the reference's stage-2
frozen-encoder recipe (reference: proposal_generator.py:234-249 trains with
the transplanted encoder frozen). Numerically this must be IDENTICAL to the
optimizer-side freeze (the chain zeroes frozen grads before clipping,
train/optim.py:30-35), pinned here, and the compiled backward must actually
shrink, also pinned here (HLO dot count).
'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.train.optim import build_optimizer, freeze_mask
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

PAD = 1
DIMS = CapModelDims(voc_size=20, d_model_A=8, d_model_V=8, d_model_C=16,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=32,
                    dout_p=0.0)


class _Cfg:
    optimizer = 'adam'
    lr = 3e-3
    grad_clip = 1.0
    weight_decay = 0.01


def _batch(rng, B=4, Sv=5, Sa=6, Sc=7):
    src = {
        'rgb': rng.normal(size=(B, Sv, 8)).astype(np.float32),
        'flow': rng.normal(size=(B, Sv, 8)).astype(np.float32),
        'audio': rng.normal(size=(B, Sa, 8)).astype(np.float32),
    }
    captions = np.full((B, Sc), PAD, np.int32)
    captions[:, 0] = 2
    for b in range(B):
        n = 3 + b % 3
        captions[b, 1:1 + n] = rng.integers(4, 20, size=n)
        captions[b, 1 + n] = 3
    return {'src': src, 'caption': captions}


def _cap_setup(is_frozen):
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    mask = freeze_mask(params, is_frozen)
    optimizer = build_optimizer(_Cfg(), frozen_mask=mask)
    return params, mask, optimizer


def _freeze_encoder_and_emb(path_keys):
    return path_keys[0] in ('encoder', 'emb_C')


@pytest.mark.parametrize('accum', [1, 2])
def test_cap_pruned_step_matches_unpruned(accum):
    '''Updated params (and loss) are identical with and without source-level
    pruning — the clip already saw zeros for frozen leaves either way.'''
    params, mask, optimizer = _cap_setup(_freeze_encoder_and_emb)
    batch = _batch(np.random.default_rng(0))

    def run(fm):
        step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, PAD,
                                           accum_steps=accum,
                                           frozen_mask=fm))
        state = init_train_state(params, optimizer)
        state, metrics = step(state, batch)
        return float(metrics['loss']), state.params

    loss_ref, params_ref = run(None)
    loss_pruned, params_pruned = run(mask)
    np.testing.assert_allclose(loss_pruned, loss_ref, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(params_pruned)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-7)


def test_cap_frozen_leaves_stay_put_and_grad_norm_is_trainable_only():
    params, mask, optimizer = _cap_setup(_freeze_encoder_and_emb)
    batch = _batch(np.random.default_rng(1))
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, PAD,
                                       frozen_mask=mask))
    state = init_train_state(params, optimizer)
    new_state, metrics = step(state, batch)
    for p0, p1, f in zip(jax.tree.leaves(params),
                         jax.tree.leaves(new_state.params),
                         jax.tree.leaves(mask)):
        if f:
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    # grad_norm counts trainable leaves only (torch: frozen params have no
    # .grad), and training did move the trainable leaves
    assert float(metrics['grad_norm']) > 0.0
    moved = any(not np.array_equal(np.asarray(p1), np.asarray(p0))
                for p0, p1, f in zip(jax.tree.leaves(params),
                                     jax.tree.leaves(new_state.params),
                                     jax.tree.leaves(mask)) if not f)
    assert moved


def _dot_count(step, state, batch):
    text = jax.jit(step).lower(state, batch).compile().as_text()
    return text.count(' dot(') + text.count(' dot.')


def test_hlo_backward_shrinks_when_frozen():
    '''The point of pruning: the compiled step has strictly fewer dot ops
    (the frozen encoder's and embedder's dW GEMMs are gone, not just
    zero-masked).'''
    params, mask, optimizer = _cap_setup(_freeze_encoder_and_emb)
    batch = _batch(np.random.default_rng(2))
    state = init_train_state(params, optimizer)

    full = make_cap_train_step(DIMS, optimizer, 0.7, PAD, frozen_mask=None)
    pruned = make_cap_train_step(DIMS, optimizer, 0.7, PAD, frozen_mask=mask)
    n_full = _dot_count(full, state, batch)
    n_pruned = _dot_count(pruned, state, batch)
    assert n_pruned < n_full, (n_pruned, n_full)


def test_lora_pruned_step_trains_adapters_only():
    '''LoRA + pruning through the real step: base bit-frozen, adapters move,
    and the compiled backward is smaller than the full-finetune one.'''
    from bmt_tpu.ops.lora import add_lora, lora_frozen_predicate

    base = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    params = add_lora(base, 2, jax.random.PRNGKey(9), targets='attn_ffn')
    mask = freeze_mask(params, lora_frozen_predicate)
    cfg = _Cfg()
    cfg.lora_rank = 2
    optimizer = build_optimizer(cfg, frozen_mask=mask)
    batch = _batch(np.random.default_rng(3))
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, PAD,
                                       frozen_mask=mask))
    state = init_train_state(params, optimizer)
    new_state, _ = step(state, batch)
    for p0, p1, f in zip(jax.tree.leaves(params),
                         jax.tree.leaves(new_state.params),
                         jax.tree.leaves(mask)):
        if f:
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
    moved = sum(not np.array_equal(np.asarray(p1), np.asarray(p0))
                for p1, p0 in zip(jax.tree.leaves(new_state.params),
                                  jax.tree.leaves(params)))
    assert moved > 0


def test_prop_pruned_step_matches_unpruned():
    '''Stage-2 recipe: frozen transplanted encoder (+ anchors, always
    frozen) — pruned and unpruned updates agree and the backward shrinks.'''
    from bmt_tpu.models import (PropModelDims,
                                init_multimodal_proposal_generator)
    from bmt_tpu.train.steps import make_prop_train_step

    pdims = PropModelDims(d_model_A=8, d_model_V=8, d_model=16, H=2, N=1,
                          d_ff_A=16, d_ff_V=16, d_vid=8, d_aud=8,
                          kernel_sizes_A=(3,), kernel_sizes_V=(3, 5),
                          conv_layers_A=(8,), conv_layers_V=(8,),
                          anchors_num_A=2, anchors_num_V=2, dout_p=0.0)
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(2),
                                                pdims)
    params['anchors_A'] = jnp.asarray([2.0, 6.0])
    params['anchors_V'] = jnp.asarray([3.0, 9.0])

    def is_frozen(path_keys):
        return path_keys[0] in ('anchors_A', 'anchors_V', 'encoder')

    mask = freeze_mask(params, is_frozen)
    optimizer = build_optimizer(_Cfg(), frozen_mask=mask)

    rng = np.random.default_rng(1)
    B, E = 4, 3
    batch = {
        'src': {
            'rgb': rng.normal(size=(B, 6, 8)).astype(np.float32),
            'flow': rng.normal(size=(B, 6, 8)).astype(np.float32),
            'audio': rng.normal(size=(B, 7, 8)).astype(np.float32),
        },
        'centers': rng.uniform(1, 12, size=(B, E)).astype(np.float32),
        'lengths': rng.uniform(1, 6, size=(B, E)).astype(np.float32),
        'valid': (np.arange(E)[None, :] < (1 + np.arange(B)[:, None] % 3)),
    }

    def run(fm):
        step = jax.jit(make_prop_train_step(pdims, optimizer, PAD,
                                            frozen_mask=fm))
        state = init_train_state(params, optimizer)
        state, metrics = step(state, batch)
        return float(metrics['loss']), state.params

    loss_ref, params_ref = run(None)
    loss_pruned, params_pruned = run(mask)
    np.testing.assert_allclose(loss_pruned, loss_ref, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(params_pruned)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-7)

    # The prop step logs no grad_norm, so the frozen dW dots were already
    # DEAD CODE (their only consumer, the optimizer, zero-masks them) and
    # the compiled modules come out identical either way. The source-level
    # stop_gradient still matters: it makes the pruning STRUCTURAL — checked
    # here at the jaxpr level — instead of an accident of which metrics the
    # step happens to return (the cap step's grad_norm kept every frozen dW
    # GEMM alive; see test_hlo_backward_shrinks_when_frozen).
    state = init_train_state(params, optimizer)

    def jaxpr_dots(fm):
        step = make_prop_train_step(pdims, optimizer, PAD, frozen_mask=fm)
        return str(jax.make_jaxpr(step)(state, batch)).count('dot_general')

    assert jaxpr_dots(mask) < jaxpr_dots(None)
