'''Batched beam-search decoding with KV caches (capability beyond the
reference, which only decodes greedily — captioning_epoch_loops.py:39-65).

Standard length-penalized beam search (Wu et al. 2016 penalty
((5 + len) / 6)^alpha, alpha = 0 -> pure log-prob sum), implemented as a
single jit-compiled ``lax.while_loop`` with early exit:

- the encoder runs once; the precomputed cross-attention K/V stay at B
  rows and are SHARED across beams (``cross_attention_step`` folds the K
  beams into the query positions) — only the small per-beam self-attention
  caches are allocated at (B * K),
- each step advances the KV-cached decoder one token for every live beam,
- finished beams are frozen by masking their continuations to a single
  zero-cost </s> extension,
- beam reordering gathers only the self-attention caches along the batch
  axis; the cross K/V never move.

Greedy is the special case K = 1 (tested equal to the greedy decoder).
Both the flagship bi-modal captioner and the uni-modal ablation models are
supported through the same core.
'''
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bmt_tpu.models.captioning import CapModelDims

_NEG_INF = -1e9


def _beam_core(step_closure, state, B: int, K: int, V: int, max_len: int,
               start_idx: int, end_idx: int, length_penalty: float):
    '''Generic KV-cached beam loop.

    step_closure(state, cur (B*K, 1), step) -> (log_probs (B*K, V), state).
    Returns (best tokens (B, max_len+1), best scores (B,)).
    '''
    tokens = jnp.full((B, K, max_len + 1), end_idx, jnp.int32)
    tokens = tokens.at[:, :, 0].set(start_idx)
    # only beam 0 is live initially (identical prefixes would flood top-k)
    scores = jnp.tile(jnp.array([0.0] + [_NEG_INF] * (K - 1)), (B, 1))
    done = jnp.zeros((B, K), bool)

    def cond_fn(carry):
        step, _, _, done, _ = carry
        return jnp.logical_and(step < max_len, jnp.logical_not(done.all()))

    def step_fn(carry):
        step, tokens, scores, done, state = carry

        cur = jax.lax.dynamic_slice_in_dim(
            tokens.reshape(B * K, -1), step, 1, axis=1)       # (B*K, 1)
        log_probs, new_state = step_closure(state, cur, step)  # (B*K, V)
        log_probs = log_probs.reshape(B, K, V).astype(jnp.float32)

        # finished beams extend only with </s> at zero cost
        frozen = jnp.full((V,), _NEG_INF).at[end_idx].set(0.0)
        log_probs = jnp.where(done[:, :, None], frozen[None, None, :],
                              log_probs)

        cand = scores[:, :, None] + log_probs                 # (B, K, V)
        new_scores, idx = jax.lax.top_k(cand.reshape(B, K * V), K)
        parent = idx // V                                     # (B, K)
        word = (idx % V).astype(jnp.int32)

        # reorder token history + caches by parent beam
        tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, word[:, :, None], step + 1, axis=2)
        done = jnp.take_along_axis(done, parent, axis=1) | (word == end_idx)

        # reorder every per-beam state leaf (leading dim B*K — the
        # self-attention caches); the precomputed cross-attention K/V live
        # at B rows (shared across beams, see
        # ops.attention.cross_attention_step) and never move. The shape
        # rule keeps this generic over future per-beam state entries.
        # (At K=1 the gather is an identity on every leaf — harmless.)
        flat_parent = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
        new_state = jax.tree.map(
            lambda x: (jnp.take(x, flat_parent, axis=0)
                       if x.ndim and x.shape[0] == B * K else x),
            new_state)

        return step + 1, tokens, new_scores, done, new_state

    # early exit once every beam of every batch element has finished
    _, tokens, scores, done, _ = jax.lax.while_loop(
        cond_fn, step_fn, (0, tokens, scores, done, state))

    # length penalty: lp = ((5 + len) / 6) ** alpha over generated lengths
    # (GNMT form; negative alpha is legal and favors SHORTER captions)
    if length_penalty != 0.0:
        is_end = tokens[:, :, 1:] == end_idx
        first_end = jnp.where(is_end.any(-1), is_end.argmax(-1) + 1, max_len)
        final = scores / (((5.0 + first_end) / 6.0) ** length_penalty)
    else:
        final = scores

    best = jnp.argmax(final, axis=1)                          # (B,)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]            # (B, L+1)
    best_scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores


@partial(jax.jit, static_argnames=('dims', 'max_len', 'start_idx', 'end_idx',
                                   'pad_idx', 'beam_size', 'length_penalty',
                                   'attention_impl', 'kv_int8'))
def beam_search_bimodal(params, dims: CapModelDims, feature_stacks: dict,
                        max_len: int, start_idx: int, end_idx: int,
                        pad_idx: int, beam_size: int = 4,
                        length_penalty: float = 0.0,
                        attention_impl: str = 'xla', kv_int8: bool = False):
    '''Returns (tokens (B, max_len + 1) int32, scores (B,)) — the best beam
    per batch element, rows formatted like the greedy decoder's output.

    The precomputed cross-attention K/V (the dominant per-step HBM reads)
    are NOT tiled per beam: ``cross_attention_step`` folds the K beams into
    the query positions, so memories are read once per step regardless of
    beam width, and beam reordering only gathers the small self-attention
    caches.
    '''
    from bmt_tpu.decode.greedy import bimodal_step_setup
    K = beam_size
    state, step_closure, B = bimodal_step_setup(
        params, dims, feature_stacks, pad_idx, max_len, attention_impl,
        kv_int8, cache_batch_mult=K)
    return _beam_core(step_closure, state, B, K, dims.voc_size, max_len,
                      start_idx, end_idx, length_penalty)


@partial(jax.jit, static_argnames=('dims', 'max_len', 'start_idx', 'end_idx',
                                   'pad_idx', 'beam_size', 'length_penalty',
                                   'attention_impl', 'kv_int8'))
def beam_search_unimodal(params, dims: CapModelDims, feature_stacks: dict,
                         max_len: int, start_idx: int, end_idx: int,
                         pad_idx: int, beam_size: int = 4,
                         length_penalty: float = 0.0,
                         attention_impl: str = 'xla', kv_int8: bool = False):
    '''Beam search for the uni-modal ablation captioners.'''
    from bmt_tpu.decode.greedy import unimodal_step_setup
    K = beam_size
    state, step_closure, B = unimodal_step_setup(
        params, dims, feature_stacks, pad_idx, max_len, attention_impl,
        kv_int8, cache_batch_mult=K)
    return _beam_core(step_closure, state, B, K, dims.voc_size, max_len,
                      start_idx, end_idx, length_penalty)


def make_bimodal_beam_fn(dims: CapModelDims, max_len: int, start_idx: int,
                         end_idx: int, pad_idx: int, beam_size: int = 4,
                         length_penalty: float = 0.0,
                         attention_impl: str = 'xla', kv_int8: bool = False):
    '''Bind statics; returns fn(params, feature_stacks) -> tokens, matching
    the greedy decoder's interface for the validation loops.'''
    search = (beam_search_bimodal if dims.modality == 'audio_video'
              else beam_search_unimodal)

    def fn(params, feature_stacks):
        toks, _ = search(params, dims, feature_stacks, max_len, start_idx,
                         end_idx, pad_idx, beam_size, length_penalty,
                         attention_impl, kv_int8)
        return toks
    return fn
