'''Fused attention kernels (Pallas, TPU).

Fuses QK^T, masking, softmax and the value matmul into one kernel so the
(Sq, Sk) logits tensor never round-trips HBM — the elementwise softmax reads
it straight from VMEM between the two MXU matmuls. Two kernels share the
dispatch:

- **single-block** (grid (B, H)): at BMT's sizes (Sq, Sk <= 1536,
  d_k = 256, H = 4) a whole (b, h) attention instance fits in VMEM (logits
  at 1536x1536 fp32 = 9.4 MB) and no tiling is needed;
- **tiled online-softmax** (grid (B, H, Sk/bk), flash-attention proper):
  for longer sequences the key/value axis is streamed in ``bk``-column
  blocks with running row-max/row-sum rescaling carried in VMEM scratch, so
  VMEM use is O(Sq·(d + bk)) regardless of Sk. Selected automatically when
  the logits (``_SINGLE_BLOCK_MAX_LOGITS``) or the k/v pair
  (``_SINGLE_BLOCK_MAX_KV_BYTES``) would not fit, or forced via
  ``flash_attention(block_k=...)``.

Scope note on the backward: the custom VJP recomputes the standard
attention gradient in plain XLA, materializing the (B, H, Sq, Sk) fp32
logits in HBM. That is fine at every BMT training shape (Sk <= 800) and
measured no slower than XLA's own backward there, but it means the
'no sequence-length limit' property is FORWARD-ONLY: differentiating at
say S = 4096+ costs O(S^2) HBM and will OOM long before the tiled forward
does. A tiled backward kernel is the known next step if training at such
lengths is ever needed.

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


# Above this many logits elements per (b, h) instance, the single-block
# kernel would not fit comfortably in ~16 MB VMEM next to q/k/v/acc: switch
# to the tiled online-softmax kernel. 1536^2 fp32 = 9.4 MB (measured OK).
_SINGLE_BLOCK_MAX_LOGITS = 1536 * 1536
_SINGLE_BLOCK_MAX_KV_BYTES = 8 * 1024 * 1024   # k+v per (b, h) in VMEM


def _attn_kernel_tiled(q_ref, k_ref, v_ref, kmask_ref, o_ref,
                       m_ref, l_ref, acc_ref, *, causal: bool, Sk: int,
                       block_q: int, block_k: int):
    '''Online-softmax attention: grid (B, H, cdiv(Sq, bq), cdiv(Sk, bk)),
    innermost axis streams key/value blocks for one query block. Scratch
    (m, l, acc) persists across the innermost grid dimension and is reset
    at jk == 0 (standard flash-attention recurrence: rescale the
    accumulator by exp(m_old - m_new) whenever the running row-max
    advances). VMEM use is O(bq·(d + bk)) — independent of both sequence
    lengths.

    q_ref: (1, 1, bq, d); k_ref/v_ref: (1, 1, bk, d); kmask_ref: (B, bk)
    (the key mask is host-padded to nk*bk columns, so every block read is
    in-bounds); o_ref: (1, 1, bq, d); m/l: (bq, 128) fp32; acc: (bq, d)
    fp32. Out-of-bounds QUERY rows (final partial q block) compute garbage
    in their own rows only — every op is row-independent — and their
    output writes are dropped by Pallas.
    '''
    b = pl.program_id(0)
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    d = q_ref.shape[3]

    @pl.when(jk == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                                    # (bq, d)
    k = k_ref[0, 0]                                    # (bk, d)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (1.0 / math.sqrt(d))                       # (bq, bk)

    # key-validity: padding mask AND in-bounds (the final k/v block may
    # read past Sk — those unspecified columns are masked before use; the
    # key mask itself is host-padded with zeros, so its read is exact)
    cols = jk * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    valid = jnp.logical_and(kmask_ref[b, :][None, :] != 0, cols < Sk)
    if causal:
        rows = iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        valid = jnp.logical_and(valid, cols <= rows)
    s = jnp.where(valid, s, _NEG_INF)

    m_old = m_ref[:, :1]                               # (bq, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    # all-masked-so-far rows keep m == -inf; exp(-inf - -inf) is NaN, so
    # pin their correction/probabilities to 0 (they stay empty until a
    # valid key appears; fully-empty rows end as 0/0 = NaN, torch-parity)
    empty = m_new == _NEG_INF
    corr = jnp.where(empty, 0.0, jnp.exp(m_old - m_new))   # (bq, 1)
    p = jnp.where(empty, 0.0, jnp.exp(s - m_new))          # (bq, bk)

    # zero OOB value rows: p is 0 there, but 0 * garbage(NaN) would poison
    # the accumulator through the matmul
    key_ids = jk * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_k, 1), 0)
    v = jnp.where(key_ids < Sk, v, 0)

    l_ref[:] = corr * l_ref[:] + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
    acc_ref[:] = corr * acc_ref[:] + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(jk == pl.num_programs(3) - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('causal', 'interpret', 'block_k'))
def _flash_attention_tiled(q, k, v, key_mask, causal: bool, interpret: bool,
                           block_k: int):
    B, H, Sq, d = q.shape
    Sk = k.shape[2]
    block_q = min(512, Sq)
    nq = -(-Sq // block_q)                             # cdiv
    nk = -(-Sk // block_k)
    pad = nk * block_k - Sk
    if pad:
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))

    return pl.pallas_call(
        functools.partial(_attn_kernel_tiled, causal=causal, Sk=Sk,
                          block_q=block_q, block_k=block_k),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b, h, iq, jk: (b, h, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b, h, iq, jk: (b, h, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b, h, iq, jk: (b, h, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_k), lambda b, h, iq, jk: (0, jk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, iq, jk: (b, h, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running row-max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running row-sum
            pltpu.VMEM((block_q, d), jnp.float32),     # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Sq * Sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        interpret=interpret,
    )(q, k, v, key_mask)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_vjp(q, k, v, key_mask, causal, block_k):
    interpret = jax.default_backend() != 'tpu'
    Sq, Sk = q.shape[2], k.shape[2]
    d = q.shape[-1]
    # the single-block kernel holds the (Sq, Sk) fp32 logits AND the whole
    # (Sk, d) k/v pair in VMEM per (b, h) instance — either can overflow
    # alone (small-Sq/huge-Sk inputs pass the logits bound but not the k/v
    # one), so both are checked
    kv_bytes = 2 * Sk * d * q.dtype.itemsize
    if block_k is None and (Sq * Sk > _SINGLE_BLOCK_MAX_LOGITS
                            or kv_bytes > _SINGLE_BLOCK_MAX_KV_BYTES):
        block_k = 512
    if block_k is not None:
        return _flash_attention_tiled(q, k, v, key_mask, causal, interpret,
                                      block_k)
    return _flash_attention_impl(q, k, v, key_mask, causal, interpret)


def _fa_fwd(q, k, v, key_mask, causal, block_k):
    out = _flash_attention_vjp(q, k, v, key_mask, causal, block_k)
    return out, (q, k, v, key_mask)


def _fa_bwd(causal, block_k, res, g):
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


def flash_attention(q, k, v, mask, block_k: int | None = None):
    '''Drop-in fused replacement for
    ``scaled_dot_attention(q, k, v, mask)``; differentiable (custom VJP).

    q: (B, H, Sq, d), k/v: (B, H, Sk, d);
    mask: None, (B, 1, 1, Sk) key padding, or (B, 1, Sq, Sk) causal+padding
    (as produced by ``multi_head_attention`` from the BMT mask dict).

    ``block_k`` forces the tiled online-softmax kernel with that key-block
    size (multiple of 128). By default the single-block kernel is used up
    to ``_SINGLE_BLOCK_MAX_LOGITS`` logits per (b, h) instance and the
    tiled kernel (bk=512) beyond — VMEM use then stays O(Sq·(d + bk))
    for arbitrarily long key sequences.
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

    return _flash_attention_vjp(q, k, v, key_mask, causal, block_k)
