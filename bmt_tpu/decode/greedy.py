'''Greedy caption decoding.

The reference decodes greedily by re-running the *entire* encoder + decoder
on the growing prefix at every step with no KV cache
(reference: epoch_loops/captioning_epoch_loops.py:39-65) — O(L^2) model
invocations per caption. Here the decode is re-cast TPU-natively:

- the encoder runs ONCE per segment; cross-attention K/V are precomputed,
- the decoder advances one token at a time through a KV cache,
- the whole loop is a single jit-compiled ``lax.while_loop`` with static
  shapes and early exit once every sequence in the batch emitted ``</s>``.

Token-for-token parity with the reference loop: pre-norm LayerNorm is
per-token, causal masking restricts self-attention to the cached prefix, and
``jnp.argmax`` matches torch ``max(dim)`` first-max tie-breaking.
An uncached parity decoder is kept for cross-validation in tests.
'''
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bmt_tpu.models.captioning import (CapModelDims, bimodal_decode_init,
                                       bimodal_decode_step, bimodal_encode)
from bmt_tpu.ops.masks import make_masks


def _greedy_core(step_closure, state, B: int, max_len: int, start_idx: int,
                 end_idx: int, select_fn=None):
    '''Shared KV-cached decode loop (bi- and uni-modal decoders differ only
    in their step function — same pattern as ``beam._beam_core``).

    step_closure(state, cur (B, 1), step) -> (log_probs (B, V), state).
    select_fn(log_probs, step) -> (B,) int32 next tokens; default greedy
    argmax (matching torch max() first-max tie-breaking). ``decode.sample``
    plugs stochastic selectors in here.
    Returns tokens (B, max_len + 1) int32.
    '''
    if select_fn is None:
        def select_fn(log_probs, step):
            return jnp.argmax(log_probs, axis=-1).astype(jnp.int32)

    tokens = jnp.full((B, max_len + 1), end_idx, jnp.int32)
    tokens = tokens.at[:, 0].set(start_idx)
    done = jnp.zeros((B,), bool)

    def cond(carry):
        step, _, done, _ = carry
        return jnp.logical_and(step < max_len, jnp.logical_not(done.all()))

    def body(carry):
        step, tokens, done, state = carry
        cur = jax.lax.dynamic_slice_in_dim(tokens, step, 1, axis=1)  # (B, 1)
        log_probs, state = step_closure(state, cur, step)
        nxt = select_fn(log_probs, step)                             # (B,)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], step + 1, axis=1)
        done = jnp.logical_or(done, nxt == end_idx)
        return step + 1, tokens, done, state

    _, tokens, _, _ = jax.lax.while_loop(cond, body, (0, tokens, done, state))
    return tokens


def bimodal_step_setup(params, dims: CapModelDims, feature_stacks: dict,
                       pad_idx: int, max_len: int,
                       attention_impl: str = 'xla', kv_int8: bool = False,
                       cache_batch_mult: int = 1):
    '''Encoder + cross-KV + cache init shared by the greedy, sampling AND
    beam decoders. Returns (state, step_closure, B).
    ``cache_batch_mult``: self-attention cache rows per batch element
    (beam search passes its beam width K; the cross-KV memories are never
    tiled per beam — cross_attention_step folds beams into queries).'''
    masks = make_masks(feature_stacks, None, 'audio_video', pad_idx)
    A_mask, V_mask = masks['A_mask'], masks['V_mask']
    Av, Va = bimodal_encode(params, dims, feature_stacks, masks,
                            deterministic=True, attention_impl=attention_impl)
    B = Av.shape[0]
    state = bimodal_decode_init(params, dims, Av, Va, max_len,
                                kv_int8=kv_int8,
                                cache_batch=B * cache_batch_mult,
                                A_mask=A_mask, V_mask=V_mask)

    def step_closure(state, cur, step):
        return bimodal_decode_step(params, dims, state, cur, step,
                                   A_mask, V_mask, attention_impl)

    return state, step_closure, B


@partial(jax.jit, static_argnames=('dims', 'max_len', 'start_idx', 'end_idx',
                                   'pad_idx', 'attention_impl', 'kv_int8'))
def greedy_decode_bimodal(params, dims: CapModelDims, feature_stacks: dict,
                          max_len: int, start_idx: int, end_idx: int,
                          pad_idx: int, attention_impl: str = 'xla',
                          kv_int8: bool = False):
    '''Batched KV-cached greedy decode.

    feature_stacks: {'rgb','flow','audio'} (B, S, D) padded segments.
    Returns tokens (B, max_len + 1) int32, row = [<s>, w1, ..., </s>, ...];
    positions after a batch-wide early stop hold ``end_idx`` (stripped by the
    string conversion anyway, matching reference semantics).

    ``kv_int8`` stores the precomputed cross-attention K/V int8 (the decode
    loop's dominant HBM traffic — ~17% faster batch decode at flagship
    shapes, at the cost of ~1e-2 relative logit error; see
    ``ops.attention.precompute_kv``).
    '''
    state, step_closure, B = bimodal_step_setup(
        params, dims, feature_stacks, pad_idx, max_len, attention_impl,
        kv_int8)
    return _greedy_core(step_closure, state, B, max_len,
                        start_idx, end_idx)


def make_bimodal_greedy_fn(dims: CapModelDims, max_len: int, start_idx: int,
                           end_idx: int, pad_idx: int,
                           attention_impl: str = 'xla',
                           kv_int8: bool = False):
    '''Bind the static arguments once; returns fn(params, feature_stacks).'''
    def fn(params, feature_stacks):
        return greedy_decode_bimodal(params, dims, feature_stacks, max_len,
                                     start_idx, end_idx, pad_idx,
                                     attention_impl, kv_int8)
    return fn


def unimodal_step_setup(params, dims: CapModelDims, feature_stacks: dict,
                        pad_idx: int, max_len: int, attention_impl: str,
                        kv_int8: bool, cache_batch_mult: int = 1):
    '''(state, step_closure, B) for the uni-modal KV-cached decode loop —
    the single-memory analog of ``bimodal_step_setup``, shared by the
    greedy, sampling and beam decoders (``cache_batch_mult`` as there).'''
    from bmt_tpu.models.captioning import (unimodal_decode_init,
                                           unimodal_decode_step,
                                           unimodal_encode)
    masks = make_masks(feature_stacks, None, dims.modality, pad_idx)
    src_mask = masks['A_mask' if dims.modality == 'audio' else 'V_mask']

    memory = unimodal_encode(params, dims, feature_stacks, src_mask,
                             attention_impl)
    B = memory.shape[0]
    state = unimodal_decode_init(params, dims, memory, max_len,
                                 kv_int8=kv_int8,
                                 cache_batch=B * cache_batch_mult,
                                 src_mask=src_mask)

    def step_closure(state, cur, step):
        return unimodal_decode_step(params, dims, state, cur, step,
                                    src_mask, attention_impl)

    return state, step_closure, B


@partial(jax.jit, static_argnames=('dims', 'max_len', 'start_idx', 'end_idx',
                                   'pad_idx', 'attention_impl', 'kv_int8'))
def greedy_decode_unimodal(params, dims: CapModelDims, feature_stacks: dict,
                           max_len: int, start_idx: int, end_idx: int,
                           pad_idx: int, attention_impl: str = 'xla',
                           kv_int8: bool = False):
    '''KV-cached greedy decode for the uni-modal Transformer ablation models
    (same structure as the bi-modal decoder; single encoder memory).'''
    state, step_closure, B = unimodal_step_setup(
        params, dims, feature_stacks, pad_idx, max_len, attention_impl,
        kv_int8)
    return _greedy_core(step_closure, state, B, max_len,
                        start_idx, end_idx)


def make_unimodal_greedy_fn(dims: CapModelDims, max_len: int, start_idx: int,
                            end_idx: int, pad_idx: int,
                            attention_impl: str = 'xla',
                            kv_int8: bool = False):
    '''Bind statics; returns fn(params, feature_stacks).'''
    def fn(params, feature_stacks):
        return greedy_decode_unimodal(params, dims, feature_stacks, max_len,
                                      start_idx, end_idx, pad_idx,
                                      attention_impl, kv_int8)
    return fn


def greedy_decode_uncached(forward_fn, feature_stacks: dict, max_len: int,
                           start_idx: int, end_idx: int, pad_idx: int,
                           modality: str):
    '''Parity port of the reference greedy loop (reference:
    captioning_epoch_loops.py:39-65): re-runs the full forward on the whole
    prefix at every step. Host-side Python loop — for tests and as a decode
    path for model variants without a cached step implementation.

    forward_fn(src, trg, masks) -> (B, St, V) log-probs.
    '''
    if 'audio' in modality:
        B = feature_stacks['audio'].shape[0]
    else:
        B = feature_stacks['rgb'].shape[0]

    done = jnp.zeros((B, 1), bool)
    trg = jnp.full((B, 1), start_idx, jnp.int32)

    while trg.shape[-1] <= max_len and not bool(done.all()):
        masks = make_masks(feature_stacks, trg, modality, pad_idx)
        preds = forward_fn(feature_stacks, trg, masks)
        next_word = jnp.argmax(preds[:, -1], axis=-1).astype(jnp.int32)[:, None]
        trg = jnp.concatenate([trg, next_word], axis=-1)
        done = done | (next_word == end_idx)
    return trg
