'''Uni-modal and bi-modal transformer encoders (functional).

Reference behaviour: model/encoders.py:9-128. Each bi-modal layer runs
self-attention per modality, then cross-attention in both directions
("audio-attended-video" Av and "video-attended-audio" Va), then per-modality
feed-forward — all with pre-norm residual connections.

TPU notes: the two modalities are independent until the cross step; XLA
schedules their matmuls back-to-back on the MXU. The per-layer Python loop
unrolls at trace time (N=2 by default) — no dynamic control flow under jit.
'''
from __future__ import annotations

import jax
import jax.numpy as jnp

from bmt_tpu.ops.attention import init_mha, multi_head_attention
from bmt_tpu.ops.layers import init_ffn, init_layer_norm, residual
from bmt_tpu.ops.moe import ffn_apply, init_moe_ffn
from bmt_tpu.parallel.seq import shard_seq


def _init_ffn_or_moe(key, d_model: int, d_ff: int, moe_experts: int = 0):
    '''Dense FFN by default; Switch MoE when moe_experts > 1 (ops/moe.py).
    The forward dispatches on the resulting param structure (ffn_apply).'''
    if moe_experts and moe_experts > 1:
        return init_moe_ffn(key, d_model, d_ff, moe_experts)
    return init_ffn(key, d_model, d_ff)


# ---------------------------------------------------------------------------
# uni-modal encoder (reference: model/encoders.py:9-33, 90-105)
# ---------------------------------------------------------------------------

def init_encoder_layer(key, d_model: int, d_ff: int, dtype=None,
                       moe_experts: int = 0) -> dict:
    k_att, k_ff = jax.random.split(key)
    return {
        'self_att': init_mha(k_att, d_model, d_model, d_model, d_model),
        'ff': _init_ffn_or_moe(k_ff, d_model, d_ff, moe_experts),
        'res': [init_layer_norm(d_model) for _ in range(2)],
    }


def init_encoder(key, d_model: int, d_ff: int, N: int,
                 moe_experts: int = 0) -> dict:
    keys = jax.random.split(key, N)
    return {'layers': [init_encoder_layer(k, d_model, d_ff,
                                          moe_experts=moe_experts)
                       for k in keys]}


def encoder_layer_forward(p, x, src_mask, H, dout_p=0.0, rngs=None,
                          deterministic=True, attention_impl='xla',
                          aux_out=None, moe_cf=1.25):
    '''Note the reference quirk: the uni-modal EncoderLayer builds its MHA
    with default dout_p=0 and its FFN with dout_p=0 — only the residual
    dropout is active (reference: encoders.py:14-15).'''
    def sublayer_att(y):
        return multi_head_attention(p['self_att'], y, y, y, src_mask, H,
                                    0.0, None, True, attention_impl)
    x = residual(p['res'][0], x, sublayer_att, dout_p,
                 next(rngs) if rngs else None, deterministic)
    x = residual(p['res'][1],
                 x, lambda y: ffn_apply(p['ff'], y, 0.0, aux_out=aux_out,
                                        capacity_factor=moe_cf),
                 dout_p, next(rngs) if rngs else None, deterministic)
    return x


def encoder_forward(params, x, src_mask, H, dout_p=0.0, rngs=None,
                    deterministic=True, attention_impl='xla',
                    aux_out=None, moe_cf=1.25):
    for p in params['layers']:
        x = encoder_layer_forward(p, x, src_mask, H, dout_p, rngs,
                                  deterministic, attention_impl,
                                  aux_out, moe_cf)
        # keep the sequence axis sp-sharded through the stack (no-op
        # outside a sequence_parallel context — see parallel/seq.py)
        x = shard_seq(x)
    return x


# ---------------------------------------------------------------------------
# bi-modal encoder (reference: model/encoders.py:36-87, 108-128)
# ---------------------------------------------------------------------------

def init_bimodal_encoder_layer(key, d_model_M1: int, d_model_M2: int,
                               d_model: int, d_ff_M1: int, d_ff_M2: int,
                               moe_experts: int = 0) -> dict:
    ks = jax.random.split(key, 6)
    return {
        'self_att_M1': init_mha(ks[0], d_model_M1, d_model_M1, d_model_M1, d_model),
        'self_att_M2': init_mha(ks[1], d_model_M2, d_model_M2, d_model_M2, d_model),
        'cross_att_M1': init_mha(ks[2], d_model_M1, d_model_M2, d_model_M2, d_model),
        'cross_att_M2': init_mha(ks[3], d_model_M2, d_model_M1, d_model_M1, d_model),
        'ff_M1': _init_ffn_or_moe(ks[4], d_model_M1, d_ff_M1, moe_experts),
        'ff_M2': _init_ffn_or_moe(ks[5], d_model_M2, d_ff_M2, moe_experts),
        'res_M1': [init_layer_norm(d_model_M1) for _ in range(3)],
        'res_M2': [init_layer_norm(d_model_M2) for _ in range(3)],
    }


def init_bimodal_encoder(key, d_model_A: int, d_model_V: int, d_model: int,
                         d_ff_A: int, d_ff_V: int, N: int,
                         moe_experts: int = 0) -> dict:
    '''M1 = audio, M2 = video (reference: encoders.py:110-113 constructs the
    layer with (d_model_A, d_model_V) and forwards x=(A, V)).'''
    keys = jax.random.split(key, N)
    return {'layers': [
        init_bimodal_encoder_layer(k, d_model_A, d_model_V, d_model,
                                   d_ff_A, d_ff_V, moe_experts)
        for k in keys]}


def bimodal_encoder_layer_forward(p, M1, M2, M1_mask, M2_mask, H,
                                  dout_p=0.0, rngs=None, deterministic=True,
                                  attention_impl='xla', aux_out=None,
                                  moe_cf=1.25):
    '''Self-att per modality -> cross-att both directions -> per-modality FFN,
    pre-norm residuals throughout (reference: encoders.py:49-87). Here the
    bi-modal MHAs and FFNs *do* carry internal dropout (dout_p), unlike the
    uni-modal layer.'''
    def nrng():
        return next(rngs) if rngs else None

    # 1. self-attention
    M1 = residual(p['res_M1'][0], M1,
                  lambda y: multi_head_attention(p['self_att_M1'], y, y, y,
                                                 M1_mask, H, dout_p, nrng(),
                                                 deterministic, attention_impl),
                  dout_p, nrng(), deterministic)
    M2 = residual(p['res_M2'][0], M2,
                  lambda y: multi_head_attention(p['self_att_M2'], y, y, y,
                                                 M2_mask, H, dout_p, nrng(),
                                                 deterministic, attention_impl),
                  dout_p, nrng(), deterministic)

    # 2. cross-attention: target modality queries the other modality
    M1m2 = residual(p['res_M1'][1], M1,
                    lambda y: multi_head_attention(p['cross_att_M1'], y, M2, M2,
                                                   M2_mask, H, dout_p, nrng(),
                                                   deterministic, attention_impl),
                    dout_p, nrng(), deterministic)
    M2m1 = residual(p['res_M2'][1], M2,
                    lambda y: multi_head_attention(p['cross_att_M2'], y, M1, M1,
                                                   M1_mask, H, dout_p, nrng(),
                                                   deterministic, attention_impl),
                    dout_p, nrng(), deterministic)

    # 3. feed-forward
    M1m2 = residual(p['res_M1'][2], M1m2,
                    lambda y: ffn_apply(p['ff_M1'], y, dout_p, nrng(),
                                        deterministic, aux_out, moe_cf),
                    dout_p, nrng(), deterministic)
    M2m1 = residual(p['res_M2'][2], M2m1,
                    lambda y: ffn_apply(p['ff_M2'], y, dout_p, nrng(),
                                        deterministic, aux_out, moe_cf),
                    dout_p, nrng(), deterministic)
    return M1m2, M2m1


def bimodal_encoder_forward(params, A, V, A_mask, V_mask, H, dout_p=0.0,
                            rngs=None, deterministic=True,
                            attention_impl='xla', remat=False,
                            aux_out=None, moe_cf=1.25):
    '''Returns (Av, Va): audio-attended-video and video-attended-audio
    memories (reference: encoders.py:115-128).

    remat=True wraps each layer in jax.checkpoint — activations are
    recomputed in the backward pass, trading FLOPs for HBM (useful at the
    Sa=800 proposal-training lengths).

    aux_out: optional list collecting MoE load-balance losses. The per-layer
    aux is summed INSIDE the (possibly rematerialized) layer closure and
    returned as an explicit output — appending traced values from within a
    jax.checkpoint region to an outer list would leak tracers.'''
    M1, M2 = A, V
    for p in params['layers']:
        def run_layer(p_, M1_, M2_, key):
            from bmt_tpu.models.captioning import _rng_stream
            rr = _rng_stream(key) if key is not None else None
            local_aux = [] if aux_out is not None else None
            M1o, M2o = bimodal_encoder_layer_forward(
                p_, M1_, M2_, A_mask, V_mask, H, dout_p, rr, deterministic,
                attention_impl, local_aux, moe_cf)
            aux = (sum(local_aux) if local_aux
                   else jnp.zeros((), jnp.float32))
            return M1o, M2o, aux
        if remat:
            run_layer = jax.checkpoint(run_layer)
        key = next(rngs) if rngs else None
        M1, M2, aux = run_layer(p, M1, M2, key)
        if aux_out is not None:
            aux_out.append(aux)
        # keep both modalities' sequence axes sp-sharded through the stack
        # (no-op outside a sequence_parallel context — parallel/seq.py)
        M1, M2 = shard_seq(M1), shard_seq(M2)
    return M1, M2  # (Av, Va)
