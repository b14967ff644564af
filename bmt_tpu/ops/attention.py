'''Multi-head attention with heterogeneous Q/K/V model dims.

This is the bi-modal cross-attention workhorse (reference:
model/multihead_attention.py:29-86): queries, keys and values may live in
*different* model dims (e.g. audio 128-d attending video 1024-d); all are
projected into a shared ``d_model`` (default 1024, H=4 heads, d_k=256), and
the output is projected back to the query's dim.

Faithful behavioural details:
- softmax over masked logits with additive -inf masking
  (reference: multihead_attention.py:16-19),
- dropout applied to the attention *output* (softmax @ V), not to the
  attention weights (reference: multihead_attention.py:22-23).

TPU notes: the core computation is two batched matmuls (MXU-bound) with an
elementwise softmax between them — XLA fuses mask+softmax into the matmuls.
``precision``/dtype are inherited from inputs; pass bf16 activations for MXU
throughput, params may stay fp32. A fused Pallas flash-attention kernel is
available behind the same signature in ``bmt_tpu.ops.pallas_attention`` and is
dispatched via ``attention_impl='pallas'``.
'''
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from bmt_tpu.ops.layers import dropout, init_linear, linear, linear_base

_NEG_INF = float('-inf')


def _project_qkv(params: dict, q, k, v):
    '''q2d/k2d/v2d projections, with shared-input LoRA fusion.

    The base GEMMs are always the three separate projections (bit-parity
    with the non-adapted model — see the probed fused-QKV dead end in
    ``self_attention_step``). When adapters are present and inputs are
    the SAME array (self-attention q=k=v, cross-attention k=v), their
    skinny A-side GEMMs — each of which pads rank 8 to the MXU's 128
    lanes — are concatenated into one (ops/lora.py:shared_lora_deltas),
    recovering most of the adapter forward overhead.'''
    sites = (params['q2d'], params['k2d'], params['v2d'])
    has = ['lora_a' in s for s in sites]
    if q is k and k is v and all(has):
        from bmt_tpu.ops.lora import apply_shared_lora
        return apply_shared_lora(sites, q,
                                 [linear_base(s, q) for s in sites])
    if k is v and has[1] and has[2]:
        from bmt_tpu.ops.lora import apply_shared_lora
        kv = apply_shared_lora(sites[1:], k,
                               [linear_base(s, k) for s in sites[1:]])
        return [linear(params['q2d'], q)] + kv
    return [linear(params['q2d'], q), linear(params['k2d'], k),
            linear(params['v2d'], v)]


def init_mha(key, d_model_Q: int, d_model_K: int, d_model_V: int,
             d_model: int | None = None, dtype=jnp.float32) -> dict:
    '''Parameters for hetero-dim MHA. ``d_model`` defaults to ``d_model_Q``
    (reference: multihead_attention.py:40-42).'''
    if d_model is None:
        d_model = d_model_Q
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        'q2d': init_linear(kq, d_model_Q, d_model, dtype),
        'k2d': init_linear(kk, d_model_K, d_model, dtype),
        'v2d': init_linear(kv, d_model_V, d_model, dtype),
        'd2q': init_linear(ko, d_model, d_model_Q, dtype),
    }


def scaled_dot_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         mask: jnp.ndarray | None) -> jnp.ndarray:
    '''softmax(QK^T / sqrt(d_k)) @ V with boolean masking.

    q: (B, H, Sq, d_k), k/v: (B, H, Sk, d_k), mask: broadcastable to
    (B, 1|H, Sq|1, Sk) boolean (True = attend). Returns (B, H, Sq, d_k).
    Reference: multihead_attention.py:8-26.
    '''
    d_k = q.shape[-1]
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(d_k)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum('bhqk,bhkd->bhqd', weights, v)


def _split_heads(x: jnp.ndarray, H: int) -> jnp.ndarray:
    B, S, D = x.shape
    return x.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, S, d_k = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * d_k)


def multi_head_attention(params: dict, q: jnp.ndarray, k: jnp.ndarray,
                         v: jnp.ndarray, mask: jnp.ndarray | None, H: int,
                         dout_p: float = 0.0, rng=None,
                         deterministic: bool = True,
                         attention_impl: str = 'xla') -> jnp.ndarray:
    '''Full hetero-dim MHA forward (reference: multihead_attention.py:55-86).

    q: (B, Sq, Dq), k: (B, Sk, Dk), v: (B, Sk, Dv); mask: (B, 1, Sk) padding
    or (B, Sq, Sk) causal+padding, or None. Returns (B, Sq, Dq).
    '''
    qy, ky, vy = _project_qkv(params, q, k, v)
    qp = _split_heads(qy, H)
    kp = _split_heads(ky, H)
    vp = _split_heads(vy, H)

    if mask is not None:
        mask = mask[:, None, :, :]  # same mask for all heads -> (B, 1, *, Sk)

    if attention_impl == 'pallas':
        from bmt_tpu.ops.pallas_attention import flash_attention
        out = flash_attention(qp, kp, vp, mask)
    else:
        out = scaled_dot_attention(qp, kp, vp, mask)

    out = dropout(out, dout_p, rng, deterministic)
    return linear(params['d2q'], _merge_heads(out))


# ---------------------------------------------------------------------------
# KV-cache variants for autoregressive decoding
# ---------------------------------------------------------------------------

def precompute_kv(params: dict, memory: jnp.ndarray, H: int,
                  quantize: bool = False, mask: jnp.ndarray | None = None):
    '''Project encoder memory into per-head K/V once per segment; reused at
    every decode step (replaces the reference's full re-encode per token,
    reference: captioning_epoch_loops.py:58-63).

    With ``quantize=True`` the K/V are stored int8 with per-(batch, head,
    channel) symmetric scales. The decode loop is bandwidth-bound on exactly
    these reads (at B=64/Sa=256/Sv=96 they are ~180 MB per decode step,
    ~6.7 ms of the ~12 ms batch decode at v5e HBM speed), so halving their
    width buys ~17% measured decode throughput (docs/DESIGN.md §6a).
    Per-channel scales make the dequantization *exact* to fold into the
    surrounding matmuls — see ``cross_attention_step``.

    ``mask`` ((B, 1, Sk) key-padding, True = attend) only matters when
    quantizing: padded positions are zeroed first so they cannot inflate the
    per-channel amax and waste int8 resolution on keys the softmax masks out
    anyway.'''
    if 'lora_a' in params['k2d'] and 'lora_a' in params['v2d']:
        from bmt_tpu.ops.lora import apply_shared_lora
        sites = (params['k2d'], params['v2d'])
        ky, vy = apply_shared_lora(
            sites, memory, [linear_base(s, memory) for s in sites])
    else:
        ky = linear(params['k2d'], memory)
        vy = linear(params['v2d'], memory)
    k = _split_heads(ky, H)
    v = _split_heads(vy, H)
    if not quantize:
        return k, v
    if mask is not None:
        keep = mask[:, None, :, :].transpose(0, 1, 3, 2)   # (B, 1, Sk, 1)
        k = jnp.where(keep, k, 0)
        v = jnp.where(keep, v, 0)
    return {'k': _quantize_per_channel(k), 'v': _quantize_per_channel(v)}


def _quantize_per_channel(x: jnp.ndarray):
    '''Symmetric int8 quantization of (B, H, S, d_k) along S: one scale per
    (batch, head, channel), so every stored value is exactly
    ``q * scale``.'''
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=2, keepdims=True)    # (B, H, 1, d_k)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.round(x32 / scale).astype(jnp.int8)
    return q, scale


def _cross_attention_q8(qp, kv, mask):
    '''Small-Sq cross-attention over int8 K/V with the per-channel scales
    folded into the matmuls (no dequantized K/V ever materializes in HBM):

      logits = (q * k_scale) @ K8^T        — K8 read as int8, cast on-chip
      out    = (weights @ V8) * v_scale

    Activations stay in the query's dtype (bf16 decode keeps bf16 matmuls
    for MXU throughput; an fp32 eval keeps fp32 so the only error added by
    the flag is the int8 quantization itself).
    '''
    (k8, k_s), (v8, v_s) = kv['k'], kv['v']
    act = qp.dtype
    d_k = qp.shape[-1]
    qf = (qp.astype(jnp.float32) * k_s).astype(act)
    logits = jnp.einsum('bhqd,bhkd->bhqk', qf, k8.astype(act),
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(d_k)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(act)
    out = jnp.einsum('bhqk,bhkd->bhqd', weights, v8.astype(act),
                     preferred_element_type=jnp.float32)
    return (out * v_s).astype(act)


def cross_attention_step(params: dict, q: jnp.ndarray, kv, mask, H: int,
                         attention_impl: str = 'xla') -> jnp.ndarray:
    '''Attention of the current token(s) over precomputed memory K/V.

    q: (B, 1, Dq); kv: (k, v) each (Bm, H, Sk, d_k), or the int8 dict from
    ``precompute_kv(quantize=True)``; mask: (Bm, 1, Sk) or None.

    Beam sharing: when ``q`` has B = Bm * K rows (K beams tiled
    ``jnp.repeat``-style over a Bm-row memory), the K beams are folded into
    the query's Sq axis — cross-attention has no causal structure and the
    key-padding mask is q-position-independent, so beams are just extra
    query rows. The big K/V tensors are then read ONCE per step for all
    beams instead of being tiled (and re-gathered on every beam reorder).

    NB: ``attention_impl`` is accepted for API symmetry but the step
    ALWAYS uses the XLA formulation: at Sq∈{1, K} the cached step is
    matvec-bound and the fused Pallas kernel's per-call overhead roughly
    halves decode throughput (measured, docs/DESIGN.md §6 — "never use
    the fused kernel there"). Auto-dispatching here means
    ``--attention_impl pallas`` keeps the kernel where it wins (the
    encoder / teacher-forced forward) without ever paying the Sq=1 loss.
    '''
    del attention_impl   # see NB above: steps are always matvec-bound
    k0 = kv['k'][0] if isinstance(kv, dict) else kv[0]
    Bm = k0.shape[0]
    qp = _split_heads(linear(params['q2d'], q), H)        # (B, H, Sq, d_k)
    B, _, Sq, d_k = qp.shape
    folded = B != Bm
    if folded:
        assert Sq == 1 and B % Bm == 0, (qp.shape, k0.shape)
        K = B // Bm
        # (Bm*K, H, 1, d_k) -> (Bm, H, K, d_k): beams become query positions
        qp = qp.reshape(Bm, K, H, d_k).transpose(0, 2, 1, 3)
    if mask is not None:
        mask = mask[:, None, :, :]
    if isinstance(kv, dict):
        out = _cross_attention_q8(qp, kv, mask)
    else:
        out = scaled_dot_attention(qp, kv[0], kv[1], mask)
    if folded:
        out = out.transpose(0, 2, 1, 3).reshape(B, H, 1, d_k)
    return linear(params['d2q'], _merge_heads(out))


def self_attention_step(params: dict, q: jnp.ndarray, cache_k: jnp.ndarray,
                        cache_v: jnp.ndarray, step: jnp.ndarray, H: int,
                        attention_impl: str = 'xla'):
    '''One causal self-attention step with a KV cache.

    q: (B, 1, Dq) — the newest token. cache_k/cache_v: (B, H, T_max, d_k)
    ring buffers holding projections of tokens [0, step]. The new token's
    K/V are written at ``step`` and attention runs over positions <= step.

    NB (probed dead end, docs/DESIGN.md §6a): concatenating the Q/K/V
    weights into one (Dq, 3D) matmul measured SLOWER on-chip (0.94x) and,
    unlike on CPU, is not bit-identical on TPU — XLA picks a different
    K-dim tiling for the wider GEMM, changing bf16 accumulation order and
    flipping near-tie argmaxes. Separate projections are kept for both
    speed and decode parity.

    Returns (out (B, 1, Dq), new_cache_k, new_cache_v).
    '''
    qy, ky, vy = _project_qkv(params, q, q, q)
    qp = _split_heads(qy, H)    # (B, H, 1, d_k)
    kp = _split_heads(ky, H)
    vp = _split_heads(vy, H)

    cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, kp, step, axis=2)
    cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, vp, step, axis=2)

    B = q.shape[0]
    T_max = cache_k.shape[2]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T_max), 3)
    valid = pos <= step                                # (1, 1, 1, T_max)

    # attention_impl is accepted for API symmetry but the Sq=1 cached step
    # always runs the XLA formulation — the fused kernel's per-call
    # overhead is a measured ~2x decode loss at this shape (DESIGN §6);
    # auto-dispatch keeps '--attention_impl pallas' fast end-to-end.
    del attention_impl, B
    out = scaled_dot_attention(qp, cache_k, cache_v, valid)
    return linear(params['d2q'], _merge_heads(out)), cache_k, cache_v
