'''Fused attention kernel (Pallas, TPU).

Fuses QK^T, masking, softmax and the value matmul into one kernel so the
(Sq, Sk) logits tensor never round-trips HBM — the elementwise softmax reads
it straight from VMEM between the two MXU matmuls. At BMT's sizes
(Sq, Sk <= 1536, d_k = 256, H = 4) a whole (b, h) attention instance fits in
VMEM (logits at 1536x1536 fp32 = 9.4 MB), so the grid is simply (B, H) with
no online-softmax tiling; K/V blocks stream per grid step.

Mask handling: BMT uses exactly two mask families
(reference: model/masking.py) —
- key padding (B, 1, Sk): broadcast over queries,
- causal AND key padding (B, Sq, Sk) for caption self-attention.
Both decompose into a (B, Sk) key-validity vector plus a static causal flag,
which is what the kernel consumes (the causal part is computed from iota
in-kernel, so no (Sq, Sk) mask is materialized in HBM at all).

Numerics match ``bmt_tpu.ops.attention.scaled_dot_attention``: fp32 logits,
-inf masking (fully-masked rows produce NaN, torch-parity), softmax in fp32,
output in the value dtype.

On non-TPU backends the kernel runs in Pallas interpreter mode (tests).
'''
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float('-inf')


def _attn_kernel(q_ref, k_ref, v_ref, kmask_ref, o_ref, *, causal: bool):
    '''One (b, h) attention instance.

    q_ref: (1, 1, Sq, d), k_ref/v_ref: (1, 1, Sk, d), kmask_ref: (1, Sk)
    int32 (1 = attend), o_ref: (1, 1, Sq, d).
    '''
    q = q_ref[0, 0]                      # (Sq, d)
    k = k_ref[0, 0]                      # (Sk, d)
    v = v_ref[0, 0]
    Sq, d = q.shape
    Sk = k.shape[0]
    b = pl.program_id(0)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Sq, Sk)
    logits = logits * (1.0 / math.sqrt(d))

    mask = kmask_ref[b, :][None, :] != 0                        # (1, Sk)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 1)
        mask = jnp.logical_and(mask, cols <= rows)
    logits = jnp.where(mask, logits, _NEG_INF)

    # numerically-stable softmax in fp32 (NaN rows preserved for parity)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - jax.lax.stop_gradient(m))
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)

    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('causal', 'interpret'))
def _flash_attention_impl(q, k, v, key_mask, causal: bool, interpret: bool):
    B, H, Sq, d = q.shape
    Sk = k.shape[2]

    grid = (B, H)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Sq, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sk, d), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            # full-array block (Mosaic requires the trailing block dims to be
            # 8/128-aligned or equal to the array dims); indexed in-kernel
            pl.BlockSpec((B, Sk), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Sq, d), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Sq * Sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        interpret=interpret,
    )(q, k, v, key_mask)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_vjp(q, k, v, key_mask, causal):
    interpret = jax.default_backend() != 'tpu'
    return _flash_attention_impl(q, k, v, key_mask, causal, interpret)


def _fa_fwd(q, k, v, key_mask, causal):
    out = _flash_attention_vjp(q, k, v, key_mask, causal)
    return out, (q, k, v, key_mask)


def _fa_bwd(causal, res, g):
    '''Backward by recomputation in plain XLA ops (the standard attention
    VJP); the fused kernel accelerates the forward, the backward matches
    what XLA would emit for the reference math.'''
    q, k, v, key_mask = res
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)

    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = key_mask[:, None, None, :] != 0
    if causal:
        Sq, Sk = q.shape[2], k.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 1)
        mask = jnp.logical_and(mask, (cols <= rows)[None, None])
    logits = jnp.where(mask, logits, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows give NaN in the forward; zero them in the backward
    p = jnp.where(jnp.isnan(p), 0.0, p).astype(v.dtype)

    g = g.astype(v.dtype)
    dv = jnp.einsum('bhqk,bhqd->bhkd', p, g)
    dp = jnp.einsum('bhqd,bhkd->bhqk', g, v).astype(jnp.float32)
    row_dot = jnp.sum(dp * p.astype(jnp.float32), axis=-1, keepdims=True)
    dlogits = (p.astype(jnp.float32) * (dp - row_dot)) * scale
    dlogits = jnp.where(mask, dlogits, 0.0).astype(q.dtype)
    dq = jnp.einsum('bhqk,bhkd->bhqd', dlogits, k)
    dk = jnp.einsum('bhqk,bhqd->bhkd', dlogits, q)
    return dq, dk, dv, None


_flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(q, k, v, mask):
    '''Drop-in fused replacement for
    ``scaled_dot_attention(q, k, v, mask)``; differentiable (custom VJP).

    q: (B, H, Sq, d), k/v: (B, H, Sk, d);
    mask: None, (B, 1, 1, Sk) key padding, or (B, 1, Sq, Sk) causal+padding
    (as produced by ``multi_head_attention`` from the BMT mask dict).
    '''
    B, H, Sq, d = q.shape
    Sk = k.shape[2]

    if mask is None:
        key_mask = jnp.ones((B, Sk), jnp.int32)
        causal = False
    elif mask.shape[2] == 1:
        key_mask = mask[:, 0, 0, :].astype(jnp.int32)
        causal = False
    else:
        # causal AND key padding: the last query row sees every non-pad key
        key_mask = mask[:, 0, -1, :].astype(jnp.int32)
        causal = True

    return _flash_attention_vjp(q, k, v, key_mask, causal)
