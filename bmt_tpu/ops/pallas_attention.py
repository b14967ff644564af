'''Fused attention kernels (Pallas, TPU).

Fuses QK^T, masking, softmax and the value matmul into one kernel so the
(Sq, Sk) logits tensor never round-trips HBM — the elementwise softmax reads
it straight from VMEM between the two MXU matmuls. Two kernels share the
dispatch:

- **single-block** (grid (B, H)): at BMT's sizes (Sq, Sk <= 1536,
  d_k = 256, H = 4) a whole (b, h) attention instance fits in VMEM (logits
  at 1536x1536 fp32 = 9.4 MB) and no tiling is needed;
- **tiled online-softmax** (grid (B, H, Sq/bq, Sk/bk), flash-attention
  proper): for longer sequences each query block streams the key/value
  axis in ``bk``-column blocks with running row-max/row-sum rescaling
  carried in VMEM scratch, so VMEM use is O(bq·(d + bk)) — independent of
  both sequence lengths. Causal grids skip the compute of the all-masked
  blocks above the diagonal (measured ~10% at S=2048 — the block DMA
  still runs). Selected automatically when the logits
  (``_SINGLE_BLOCK_MAX_LOGITS``) or the k/v pair
  (``_SINGLE_BLOCK_MAX_KV_BYTES``) would not fit, or forced via
  ``flash_attention(block_k=...)``.

The backward mirrors the dispatch. On the single-block path the custom
VJP recomputes the standard attention gradient in plain XLA (fine at every
BMT training shape, Sk <= 800, and measured no slower than XLA's own
backward there). On the tiled path the forward additionally saves the row
log-sum-exp and the backward runs two tiled Pallas kernels (dq; dk/dv)
that reconstruct p = exp(s - lse) blockwise — HBM stays O(S·d) in both
directions, so the 'no sequence-length limit' property holds for training
too. Measured on one v5e chip (B=8, H=4, d=256, bf16, fwd+bwd): parity
with XLA's materialized backward at S<=4096, and still training at
S=8192 (~3.4 s) where the XLA backward fails to compile (its three
(B, H, S, S) fp32 gradient tensors would need ~25 GB).

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


def _attn_kernel_tiled_nolse(q_ref, k_ref, v_ref, kmask_ref, o_ref,
                             m_ref, l_ref, acc_ref, **kw):
    '''Inference/primal variant: no lse output (the pallas_call then has a
    single output, so no dead (B, H, Sq, 8) write on undifferentiated
    calls).'''
    _attn_kernel_tiled(q_ref, k_ref, v_ref, kmask_ref, o_ref, None,
                       m_ref, l_ref, acc_ref, **kw)


def _attn_kernel_tiled(q_ref, k_ref, v_ref, kmask_ref, o_ref, lse_ref,
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

    def compute():
        q = q_ref[0, 0]                                # (bq, d)
        k = k_ref[0, 0]                                # (bk, d)
        v = v_ref[0, 0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / math.sqrt(d))                   # (bq, bk)

        # key-validity: padding mask AND in-bounds (the final k/v block may
        # read past Sk — those unspecified columns are masked before use;
        # the key mask itself is host-padded with zeros, so its read is
        # exact)
        cols = jk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = jnp.logical_and(kmask_ref[b, :][None, :] != 0, cols < Sk)
        if causal:
            rows = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            valid = jnp.logical_and(valid, cols <= rows)
        s = jnp.where(valid, s, _NEG_INF)

        m_old = m_ref[:, :1]                           # (bq, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        # all-masked-so-far rows keep m == -inf; exp(-inf - -inf) is NaN,
        # so pin their correction/probabilities to 0 (they stay empty
        # until a valid key appears; fully-empty rows end as 0/0 = NaN,
        # torch-parity)
        empty = m_new == _NEG_INF
        corr = jnp.where(empty, 0.0, jnp.exp(m_old - m_new))   # (bq, 1)
        p = jnp.where(empty, 0.0, jnp.exp(s - m_new))          # (bq, bk)

        # zero OOB value rows: p is 0 there, but 0 * garbage(NaN) would
        # poison the accumulator through the matmul
        key_ids = jk * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0)
        v = jnp.where(key_ids < Sk, v, 0)

        l_ref[:] = corr * l_ref[:] + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
        acc_ref[:] = corr * acc_ref[:] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    if causal:
        # key blocks entirely above the diagonal are all-masked: skipping
        # them leaves m/l/acc untouched (an all-masked block contributes
        # corr = 1, p = 0). Only the COMPUTE is skipped — Pallas still
        # DMAs the block, and at d=256 the k/v block copy costs about as
        # much as its matmuls, so the measured win is ~10% at S=2048
        # (not the ~40% dead-block fraction).
        pl.when(jk * block_k <= iq * block_q + block_q - 1)(compute)
    else:
        compute()

    @pl.when(jk == pl.num_programs(3) - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        if lse_ref is not None:
            # row log-sum-exp, saved for the tiled backward:
            # p_ij = exp(s_ij - lse_i) reconstructs the softmax exactly
            # (empty rows: m = -inf, l = 0 -> lse = -inf). Stored 8 lanes
            # wide — Mosaic requires >= (8-divisible, full-dim) trailing
            # block dims, and a (bq, 8) broadcast is the cheapest legal
            # layout.
            lse_ref[0, 0] = jnp.broadcast_to(
                m_ref[:, :1] + jnp.log(l_ref[:, :1]), lse_ref.shape[2:])


@functools.partial(jax.jit,
                   static_argnames=('causal', 'interpret', 'block_k',
                                    'with_lse'))
def _flash_attention_tiled(q, k, v, key_mask, causal: bool, interpret: bool,
                           block_k: int, with_lse: bool = False):
    B, H, Sq, d = q.shape
    Sk = k.shape[2]
    block_q = min(512, Sq)
    nq = -(-Sq // block_q)                             # cdiv
    nk = -(-Sk // block_k)
    pad = nk * block_k - Sk
    if pad:
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))

    out_specs = [pl.BlockSpec((1, 1, block_q, d),
                              lambda b, h, iq, jk: (b, h, iq, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, H, Sq, d), q.dtype)]
    lse_bytes = 0
    if with_lse:
        out_specs.append(pl.BlockSpec((1, 1, block_q, 8),
                                      lambda b, h, iq, jk: (b, h, iq, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, H, Sq, 8), jnp.float32))
        lse_bytes = B * H * Sq * 8 * 4
    kernel = _attn_kernel_tiled if with_lse else _attn_kernel_tiled_nolse

    res = pl.pallas_call(
        functools.partial(kernel, causal=causal, Sk=Sk,
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running row-max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running row-sum
            pltpu.VMEM((block_q, d), jnp.float32),     # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Sq * Sk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + q.size * q.dtype.itemsize + lse_bytes,
            transcendentals=B * H * Sq * Sk,
        ),
        interpret=interpret,
    )(q, k, v, key_mask)
    return (res[0], res[1]) if with_lse else res[0]


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


def _resolve_block_k(q, k, block_k):
    '''Shared dispatch: None -> single-block kernel, an int -> tiled with
    that key-block size. The single-block kernel holds the (Sq, Sk) fp32
    logits AND the whole (Sk, d) k/v pair in VMEM per (b, h) instance —
    either can overflow alone (small-Sq/huge-Sk inputs pass the logits
    bound but not the k/v one), so both are checked.'''
    Sq, Sk = q.shape[2], k.shape[2]
    d = q.shape[-1]
    kv_bytes = 2 * Sk * d * q.dtype.itemsize
    if block_k is None and (Sq * Sk > _SINGLE_BLOCK_MAX_LOGITS
                            or kv_bytes > _SINGLE_BLOCK_MAX_KV_BYTES):
        return 512
    return block_k


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_vjp(q, k, v, key_mask, causal, block_k):
    interpret = jax.default_backend() != 'tpu'
    block_k = _resolve_block_k(q, k, block_k)
    if block_k is not None:
        return _flash_attention_tiled(q, k, v, key_mask, causal, interpret,
                                      block_k)
    return _flash_attention_impl(q, k, v, key_mask, causal, interpret)


def _recon_p(q, k, lse_col, kmask_row, causal: bool, row_off, col_off,
             scale: float, block_q: int, block_k: int):
    '''Reconstruct this block's softmax probabilities from the saved row
    log-sum-exp: p = where(valid, exp(q·kᵀ·scale − lse), 0). Shared by both
    backward kernels so their masking/scaling can never desynchronize.
    Empty rows have lse = −inf and no valid column, so where() leaves them
    all-zero.'''
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = kmask_row[None, :] != 0
    if causal:
        rows = row_off + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        cols = col_off + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        valid = jnp.logical_and(valid, cols <= rows)
    return jnp.where(valid, jnp.exp(s - lse_col), 0.0)


def _dq_kernel(q_ref, do_ref, lse_ref, drow_ref, k_ref, v_ref, kmask_ref,
               dq_ref, acc_ref, *, causal: bool, scale: float,
               block_q: int, block_k: int):
    '''grid (B, H, nq, nk): one query block accumulates dq over key blocks.
    All inputs are host-padded to block multiples (padded q rows carry
    zero dO and zero row-dot, so their contributions vanish; padded key
    columns are masked by the zero-padded key mask).'''
    b = pl.program_id(0)
    iq = pl.program_id(2)
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        p = _recon_p(q, k, lse_ref[0, 0, :, :1], kmask_ref[b, :], causal,
                     iq * block_q, jk * block_k, scale, block_q, block_k)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - drow_ref[0, 0, :, :1]) * scale
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # skip the compute of key blocks entirely above the diagonal
        # (all-masked); block DMA still runs — see _attn_kernel_tiled
        pl.when(jk * block_k <= iq * block_q + block_q - 1)(compute)
    else:
        compute()

    @pl.when(jk == pl.num_programs(3) - 1)
    def _():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, do_ref, lse_ref, drow_ref, k_ref, v_ref, kmask_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, causal: bool,
                scale: float, block_q: int, block_k: int):
    '''grid (B, H, nk, nq): one key block accumulates dk/dv over query
    blocks (same p reconstruction as _dq_kernel, transposed roles).'''
    b = pl.program_id(0)
    ik = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        p = _recon_p(q, k, lse_ref[0, 0, :, :1], kmask_ref[b, :], causal,
                     iq * block_q, ik * block_k, scale, block_q, block_k)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - drow_ref[0, 0, :, :1]) * scale
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        pl.when(ik * block_k <= iq * block_q + block_q - 1)(compute)
    else:
        compute()

    @pl.when(iq == pl.num_programs(3) - 1)
    def _():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=('causal', 'interpret',
                                             'block_k'))
def _flash_attention_tiled_bwd(q, k, v, key_mask, lse, out, g,
                               causal: bool, interpret: bool, block_k: int):
    '''Tiled flash-attention backward: VMEM O(bq·bk) per program, HBM
    O(S·d) — no (Sq, Sk) tensor ever materializes. Everything is
    host-padded to block multiples so the kernels never read out of
    bounds: padded q rows have dO = 0 and row-dot = 0 (their ds vanishes),
    padded key columns are masked by the zero-padded key mask.'''
    B, H, Sq, d = q.shape
    Sk = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    block_q = min(512, -(-Sq // 8) * 8)
    nq = -(-Sq // block_q)
    nk = -(-Sk // block_k)
    pq = nq * block_q - Sq
    pk = nk * block_k - Sk

    # D_i = dO_i . O_i (the softmax-jacobian row-dot); NaN for fully-masked
    # rows (O is NaN there) -> zero, matching p == 0 on those rows.
    # Broadcast to the same 8-lane layout as the saved lse.
    drow = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    drow = jnp.where(jnp.isnan(drow), 0.0, drow)
    drow = jnp.broadcast_to(drow[..., None], (*drow.shape, 8))

    pad4 = lambda x, p: jnp.pad(x, ((0, 0), (0, 0), (0, p), (0, 0))) \
        if p else x
    qp, dop = pad4(q, pq), pad4(g, pq)
    lsep, drowp = pad4(lse, pq), pad4(drow, pq)
    kp, vp = pad4(k, pk), pad4(v, pk)
    kmp = jnp.pad(key_mask, ((0, 0), (0, pk))) if pk else key_mask

    bspec_q = lambda f: pl.BlockSpec((1, 1, block_q, d), f,
                                     memory_space=pltpu.VMEM)
    bspec_q3 = lambda f: pl.BlockSpec((1, 1, block_q, 8), f,
                                      memory_space=pltpu.VMEM)
    bspec_k = lambda f: pl.BlockSpec((1, 1, block_k, d), f,
                                     memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, causal=causal, scale=scale,
                          block_q=block_q, block_k=block_k),
        grid=(B, H, nq, nk),
        in_specs=[
            bspec_q(lambda b, h, iq, jk: (b, h, iq, 0)),
            bspec_q(lambda b, h, iq, jk: (b, h, iq, 0)),
            bspec_q3(lambda b, h, iq, jk: (b, h, iq, 0)),
            bspec_q3(lambda b, h, iq, jk: (b, h, iq, 0)),
            bspec_k(lambda b, h, iq, jk: (b, h, jk, 0)),
            bspec_k(lambda b, h, iq, jk: (b, h, jk, 0)),
            pl.BlockSpec((B, block_k), lambda b, h, iq, jk: (0, jk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=bspec_q(lambda b, h, iq, jk: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, nq * block_q, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * B * H * Sq * Sk * d,
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        interpret=interpret,
    )(qp, dop, lsep, drowp, kp, vp, kmp)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, causal=causal, scale=scale,
                          block_q=block_q, block_k=block_k),
        grid=(B, H, nk, nq),
        in_specs=[
            bspec_q(lambda b, h, ik, iq: (b, h, iq, 0)),
            bspec_q(lambda b, h, ik, iq: (b, h, iq, 0)),
            bspec_q3(lambda b, h, ik, iq: (b, h, iq, 0)),
            bspec_q3(lambda b, h, ik, iq: (b, h, iq, 0)),
            bspec_k(lambda b, h, ik, iq: (b, h, ik, 0)),
            bspec_k(lambda b, h, ik, iq: (b, h, ik, 0)),
            pl.BlockSpec((B, block_k), lambda b, h, ik, iq: (0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            bspec_k(lambda b, h, ik, iq: (b, h, ik, 0)),
            bspec_k(lambda b, h, ik, iq: (b, h, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, nk * block_k, d), k.dtype),
            jax.ShapeDtypeStruct((B, H, nk * block_k, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * H * Sq * Sk * d,
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Sq * Sk,
        ),
        interpret=interpret,
    )(qp, dop, lsep, drowp, kp, vp, kmp)

    return dq[:, :, :Sq, :], dk[:, :, :Sk, :], dv[:, :, :Sk, :]


def _fa_fwd(q, k, v, key_mask, causal, block_k):
    interpret = jax.default_backend() != 'tpu'
    bk = _resolve_block_k(q, k, block_k)
    if bk is not None:
        out, lse = _flash_attention_tiled(q, k, v, key_mask, causal,
                                          interpret, bk, with_lse=True)
        return out, (q, k, v, key_mask, lse, out)
    out = _flash_attention_impl(q, k, v, key_mask, causal, interpret)
    return out, (q, k, v, key_mask, None, None)


def _fa_bwd(causal, block_k, res, g):
    '''Backward dispatch mirrors the forward: the tiled path uses the
    tiled Pallas backward (saved row-lse, VMEM-bounded — the
    'no sequence-length limit' property holds for training too); the
    single-block path recomputes the standard attention VJP in plain XLA
    ops, which matches what XLA would emit at those (small) shapes.'''
    q, k, v, key_mask, lse, out = res
    if lse is not None:
        interpret = jax.default_backend() != 'tpu'
        bk = _resolve_block_k(q, k, block_k)
        dq, dk, dv = _flash_attention_tiled_bwd(
            q, k, v, key_mask, lse, out, g, causal, interpret, bk)
        return dq, dk, dv, None

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
