'''Uni-modal and bi-modal transformer decoders (functional).

Reference behaviour: model/decoders.py:9-136. The bi-modal decoder layer runs
causal self-attention over the caption, attends the audio memory (Av) and the
video memory (Va) separately, fuses the two streams via a BridgeConnection
(2*Dc -> Dc), then a feed-forward — all pre-norm residual.

Both a full-sequence forward (teacher forcing / training) and a single-step
forward with KV caches (greedy decoding) are provided. The step forward is the
source of the decode-throughput win over the reference, which re-encodes the
whole prefix every step (reference: captioning_epoch_loops.py:58-63).
'''
from __future__ import annotations

import jax
import jax.numpy as jnp

from bmt_tpu.ops.attention import (cross_attention_step, init_mha,
                                   multi_head_attention, precompute_kv,
                                   self_attention_step)
from bmt_tpu.ops.layers import (bridge, init_bridge, init_layer_norm,
                                layer_norm, residual)
from bmt_tpu.ops.moe import ffn_apply
from bmt_tpu.ops.quant import linear_out_dim
from bmt_tpu.models.encoders import _init_ffn_or_moe


# ---------------------------------------------------------------------------
# uni-modal decoder (reference: model/decoders.py:9-34, 95-111)
# ---------------------------------------------------------------------------

def init_decoder_layer(key, d_model: int, d_ff: int,
                       moe_experts: int = 0) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        'self_att': init_mha(k1, d_model, d_model, d_model, d_model),
        'enc_att': init_mha(k2, d_model, d_model, d_model, d_model),
        'ff': _init_ffn_or_moe(k3, d_model, d_ff, moe_experts),
        'res': [init_layer_norm(d_model) for _ in range(3)],
    }


def init_decoder(key, d_model: int, d_ff: int, N: int,
                 moe_experts: int = 0) -> dict:
    keys = jax.random.split(key, N)
    return {'layers': [init_decoder_layer(k, d_model, d_ff,
                                          moe_experts=moe_experts)
                       for k in keys]}


def decoder_forward(params, x, memory, src_mask, trg_mask, H, dout_p=0.0,
                    rngs=None, deterministic=True, attention_impl='xla',
                    aux_out=None, moe_cf=1.25):
    '''As in the uni-modal encoder, the reference builds MHA/FFN here with
    dout_p=0 — only residual dropout is active (reference: decoders.py:14-16).'''
    def nrng():
        return next(rngs) if rngs else None

    for p in params['layers']:
        x = residual(p['res'][0], x,
                     lambda y: multi_head_attention(p['self_att'], y, y, y,
                                                    trg_mask, H, 0.0, None,
                                                    True, attention_impl),
                     dout_p, nrng(), deterministic)
        x = residual(p['res'][1], x,
                     lambda y: multi_head_attention(p['enc_att'], y, memory,
                                                    memory, src_mask, H, 0.0,
                                                    None, True, attention_impl),
                     dout_p, nrng(), deterministic)
        x = residual(p['res'][2], x,
                     lambda y: ffn_apply(p['ff'], y, 0.0, aux_out=aux_out,
                                         capacity_factor=moe_cf),
                     dout_p, nrng(), deterministic)
    return x


# ---------------------------------------------------------------------------
# bi-modal decoder (reference: model/decoders.py:37-92, 114-136)
# ---------------------------------------------------------------------------

def init_bimodal_decoder_layer(key, d_model_A: int, d_model_V: int,
                               d_model_C: int, d_model: int, d_ff_C: int,
                               moe_experts: int = 0) -> dict:
    ks = jax.random.split(key, 5)
    return {
        'self_att': init_mha(ks[0], d_model_C, d_model_C, d_model_C, d_model),
        'enc_att_A': init_mha(ks[1], d_model_C, d_model_A, d_model_A, d_model),
        'enc_att_V': init_mha(ks[2], d_model_C, d_model_V, d_model_V, d_model),
        'bridge': init_bridge(ks[3], 2 * d_model_C, d_model_C),
        'ff': _init_ffn_or_moe(ks[4], d_model_C, d_ff_C, moe_experts),
        'res_self': init_layer_norm(d_model_C),
        'res_enc_A': init_layer_norm(d_model_C),
        'res_enc_V': init_layer_norm(d_model_C),
        'res_ff': init_layer_norm(d_model_C),
    }


def init_bimodal_decoder(key, d_model_A: int, d_model_V: int, d_model_C: int,
                         d_model: int, d_ff_C: int, N: int,
                         moe_experts: int = 0) -> dict:
    keys = jax.random.split(key, N)
    return {'layers': [
        init_bimodal_decoder_layer(k, d_model_A, d_model_V, d_model_C,
                                   d_model, d_ff_C, moe_experts)
        for k in keys]}


def bimodal_decoder_layer_forward(p, C, Av, Va, A_mask, V_mask, C_mask, H,
                                  dout_p=0.0, rngs=None, deterministic=True,
                                  attention_impl='xla', aux_out=None,
                                  moe_cf=1.25):
    '''Reference: decoders.py:55-92.'''
    def nrng():
        return next(rngs) if rngs else None

    # 1. causal self-attention on the caption
    C = residual(p['res_self'], C,
                 lambda y: multi_head_attention(p['self_att'], y, y, y, C_mask,
                                                H, dout_p, nrng(),
                                                deterministic, attention_impl),
                 dout_p, nrng(), deterministic)

    # 2. encoder attention over each memory separately
    Ca = residual(p['res_enc_A'], C,
                  lambda y: multi_head_attention(p['enc_att_A'], y, Av, Av,
                                                 A_mask, H, dout_p, nrng(),
                                                 deterministic, attention_impl),
                  dout_p, nrng(), deterministic)
    Cv = residual(p['res_enc_V'], C,
                  lambda y: multi_head_attention(p['enc_att_V'], y, Va, Va,
                                                 V_mask, H, dout_p, nrng(),
                                                 deterministic, attention_impl),
                  dout_p, nrng(), deterministic)

    # fuse [Ca; Cv] -> Dc via the bridge
    C = bridge(p['bridge'], jnp.concatenate([Ca, Cv], axis=-1), dout_p,
               nrng(), deterministic)

    # 3. feed-forward
    C = residual(p['res_ff'], C,
                 lambda y: ffn_apply(p['ff'], y, dout_p, nrng(),
                                     deterministic, aux_out, moe_cf),
                 dout_p, nrng(), deterministic)
    return C


def bimodal_decoder_forward(params, C, Av, Va, A_mask, V_mask, C_mask, H,
                            dout_p=0.0, rngs=None, deterministic=True,
                            attention_impl='xla', aux_out=None, moe_cf=1.25):
    for p in params['layers']:
        C = bimodal_decoder_layer_forward(p, C, Av, Va, A_mask, V_mask,
                                          C_mask, H, dout_p, rngs,
                                          deterministic, attention_impl,
                                          aux_out, moe_cf)
    return C


# ---------------------------------------------------------------------------
# KV-cached single-step decode path
# ---------------------------------------------------------------------------

def init_unimodal_decode_state(params, memory, H: int, max_len: int,
                               dtype=jnp.float32, kv_int8: bool = False,
                               cache_batch: int | None = None,
                               src_mask: jnp.ndarray | None = None):
    '''KV-cache decode state for the uni-modal decoder: precomputed
    encoder-attention K/V plus empty self-attention caches per layer.'''
    B = cache_batch if cache_batch is not None else memory.shape[0]
    state = []
    for p in params['layers']:
        d_model = linear_out_dim(p['self_att']['k2d'])
        d_k = d_model // H
        state.append({
            'kv_mem': precompute_kv(p['enc_att'], memory, H,
                                    quantize=kv_int8, mask=src_mask),
            'cache_k': jnp.zeros((B, H, max_len, d_k), dtype),
            'cache_v': jnp.zeros((B, H, max_len, d_k), dtype),
        })
    return state


def unimodal_decoder_step(params, state, c_t, src_mask, step, H: int,
                          attention_impl: str = 'xla'):
    '''One KV-cached step of the uni-modal decoder (mirrors
    ``bimodal_decoder_step``; reference layer: decoders.py:18-34).'''
    new_state = []
    for p, s in zip(params['layers'], state):
        normed = layer_norm(p['res'][0], c_t)
        att, ck, cv = self_attention_step(p['self_att'], normed,
                                          s['cache_k'], s['cache_v'], step, H,
                                          attention_impl)
        c_t = c_t + att

        normed = layer_norm(p['res'][1], c_t)
        c_t = c_t + cross_attention_step(p['enc_att'], normed, s['kv_mem'],
                                         src_mask, H, attention_impl)

        c_t = c_t + ffn_apply(p['ff'], layer_norm(p['res'][2], c_t))
        new_state.append({'kv_mem': s['kv_mem'], 'cache_k': ck,
                          'cache_v': cv})
    return c_t, new_state


def init_decode_state(params, Av, Va, H: int, max_len: int, dtype=jnp.float32,
                      kv_int8: bool = False, cache_batch: int | None = None,
                      A_mask: jnp.ndarray | None = None,
                      V_mask: jnp.ndarray | None = None):
    '''Precompute per-layer cross-attention K/V from the encoder memories and
    allocate empty self-attention caches.

    ``kv_int8`` stores the (large, re-read every step) cross-attention K/V
    int8 with per-channel scales — see ``bmt_tpu.ops.attention.precompute_kv``.
    The (tiny) self-attention caches always stay in ``dtype``.

    ``cache_batch`` sizes the self-attention caches independently of the
    memory batch (beam search: caches are per-beam B*K while the
    cross-attention K/V stay per-segment B and are shared across beams —
    see ``ops.attention.cross_attention_step``).

    ``A_mask``/``V_mask`` ((B, 1, S) key padding) only affect the int8
    path: masked positions are zeroed before quantization so padding can't
    inflate the per-channel scales.

    Returns a pytree: list over layers of
      {'kvA', 'kvV': (k, v) precomputed, 'cache_k', 'cache_v': (B,H,T,d_k)}.
    '''
    B = cache_batch if cache_batch is not None else Av.shape[0]
    state = []
    for p in params['layers']:
        d_model = linear_out_dim(p['self_att']['k2d'])
        d_k = d_model // H
        state.append({
            'kvA': precompute_kv(p['enc_att_A'], Av, H, quantize=kv_int8,
                                 mask=A_mask),
            'kvV': precompute_kv(p['enc_att_V'], Va, H, quantize=kv_int8,
                                 mask=V_mask),
            'cache_k': jnp.zeros((B, H, max_len, d_k), dtype),
            'cache_v': jnp.zeros((B, H, max_len, d_k), dtype),
        })
    return state


def bimodal_decoder_step(params, state, c_t, A_mask, V_mask, step, H: int,
                         attention_impl: str = 'xla'):
    '''Advance the decoder by one token using KV caches.

    c_t: (B, 1, Dc) — embedded+pos-encoded current token.
    step: scalar int32 — current position (0-based).
    Mathematically identical to running ``bimodal_decoder_forward`` on the
    full prefix and taking the last position: pre-norm LN is per-token, the
    causal mask restricts self-attention to the cached prefix, and the
    cross/bridge/FFN blocks are position-wise.

    Returns (c_out (B, 1, Dc), new_state).
    '''
    new_state = []
    for p, s in zip(params['layers'], state):
        # 1. causal self-attention via cache (pre-norm residual)
        normed = layer_norm(p['res_self'], c_t)
        att, ck, cv = self_attention_step(p['self_att'], normed,
                                          s['cache_k'], s['cache_v'], step, H,
                                          attention_impl)
        c_t = c_t + att

        # 2. cross-attention over precomputed memories
        normed = layer_norm(p['res_enc_A'], c_t)
        Ca = c_t + cross_attention_step(p['enc_att_A'], normed, s['kvA'],
                                        A_mask, H, attention_impl)
        normed = layer_norm(p['res_enc_V'], c_t)
        Cv = c_t + cross_attention_step(p['enc_att_V'], normed, s['kvV'],
                                        V_mask, H, attention_impl)

        c_t = bridge(p['bridge'], jnp.concatenate([Ca, Cv], axis=-1))

        # 3. feed-forward (pre-norm residual)
        c_t = c_t + ffn_apply(p['ff'], layer_norm(p['res_ff'], c_t))

        new_state.append({'kvA': s['kvA'], 'kvV': s['kvV'],
                          'cache_k': ck, 'cache_v': cv})
    return c_t, new_state
