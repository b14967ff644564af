'''On-chip decomposition of the greedy-decode and train-step wall clock.

Times each stage of the benchmark path separately so optimization work
targets the real bottleneck:

  encode      — bi-modal encoder forward (runs once per decode batch)
  kv_init     — cross-attention K/V precompute + cache allocation
  steps       — the 30-token KV-cached while_loop, encoder outputs reused
  full        — greedy_decode_bimodal end-to-end (sanity: ≈ sum of above)
  lm_head     — one decode step's generator matmul + log_softmax
  train       — teacher-forced train step (for MFU context)

Usage: python examples/perf_decomp.py [--B 64]
'''
import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(1, os.path.join(os.path.dirname(__file__), '..'))


def best_of(fn, iters=10, reps=4):
    fn()  # warmup/compile
    fn()
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        np.asarray(out)  # axon: block_until_ready is a no-op
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--B', type=int, default=64)
    ap.add_argument('--Sa', type=int, default=256)
    ap.add_argument('--Sv', type=int, default=96)
    ap.add_argument('--max_len', type=int, default=30)
    args = ap.parse_args()

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from bmt_tpu.decode import greedy_decode_bimodal
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    from bmt_tpu.models.captioning import (bimodal_decode_init,
                                           bimodal_decode_step,
                                           bimodal_encode)
    from bmt_tpu.ops.masks import make_masks

    # dispatch/tunnel round-trip floor: a trivial jit call
    @jax.jit
    def _nop(x):
        return x + 1.0
    t_nop = best_of(lambda: _nop(jnp.float32(0.0)))
    print(f'dispatch floor   {t_nop * 1e3:8.3f} ms')

    B, Sa, Sv, MAX_LEN = args.B, args.Sa, args.Sv, args.max_len
    dims = CapModelDims(voc_size=10172)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    bf16 = jnp.bfloat16
    params = jax.tree.map(
        lambda x: x.astype(bf16) if x.dtype == jnp.float32 else x, params)

    rng = np.random.default_rng(0)
    stacks = {
        'rgb': jnp.asarray(rng.normal(size=(B, Sv, 1024)), bf16),
        'flow': jnp.asarray(rng.normal(size=(B, Sv, 1024)), bf16),
        'audio': jnp.asarray(rng.normal(size=(B, Sa, 128)), bf16),
    }
    masks = make_masks(stacks, None, 'audio_video', 1)

    # NB: every timed jit returns a SCALAR — returning a real array would
    # time the host transfer over the device tunnel, not the computation.

    # --- encode ------------------------------------------------------------
    @jax.jit
    def encode(params, stacks):
        m = make_masks(stacks, None, 'audio_video', 1)
        Av, Va = bimodal_encode(params, dims, stacks, m, deterministic=True)
        return jnp.sum(Av[:, 0, 0]) + jnp.sum(Va[:, 0, 0])

    t_enc = best_of(lambda: encode(params, stacks))
    print(f'encode           {t_enc * 1e3:8.3f} ms')

    @jax.jit
    def encode_full(params, stacks):
        m = make_masks(stacks, None, 'audio_video', 1)
        return bimodal_encode(params, dims, stacks, m, deterministic=True)

    Av, Va = encode_full(params, stacks)

    # --- kv precompute + cache alloc ----------------------------------------
    @jax.jit
    def kv_init(params, Av, Va):
        state = bimodal_decode_init(params, dims, Av, Va, MAX_LEN)
        return sum(jnp.sum(x[:, 0, 0, 0]) for x in jax.tree.leaves(state)
                   if x.ndim == 4)

    t_kv = best_of(lambda: kv_init(params, Av, Va))
    print(f'kv_init          {t_kv * 1e3:8.3f} ms')

    # --- decode steps only (memories fixed) ---------------------------------
    @jax.jit
    def steps_only(params, Av, Va, A_mask, V_mask):
        state = bimodal_decode_init(params, dims, Av, Va, MAX_LEN)
        tokens = jnp.full((B, MAX_LEN + 1), -1, jnp.int32).at[:, 0].set(2)
        done = jnp.zeros((B,), bool)

        def cond(c):
            step, _, done, _ = c
            return jnp.logical_and(step < MAX_LEN,
                                   jnp.logical_not(done.all()))

        def body(c):
            step, tokens, done, state = c
            cur = jax.lax.dynamic_slice_in_dim(tokens, step, 1, axis=1)
            lp, state = bimodal_decode_step(params, dims, state, cur, step,
                                            A_mask, V_mask)
            nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], step + 1, axis=1)
            done = jnp.logical_or(done, nxt == -1)
            return step + 1, tokens, done, state

        _, tokens, _, _ = jax.lax.while_loop(
            cond, body, (0, tokens, done, state))
        return jnp.sum(tokens)  # scalar: don't time the tunnel transfer

    t_steps = best_of(
        lambda: steps_only(params, Av, Va, masks['A_mask'], masks['V_mask']))
    print(f'steps (kv_init+{MAX_LEN}) {t_steps * 1e3:8.3f} ms')

    # --- one decode step (amortized LM head etc.) ---------------------------
    state0 = jax.jit(lambda p, a, v: bimodal_decode_init(p, dims, a, v,
                                                         MAX_LEN))(
        params, Av, Va)
    tok = jnp.full((B, 1), 2, jnp.int32)

    @jax.jit
    def one_step(params, state, tok):
        lp, state = bimodal_decode_step(params, dims, state, tok, 0,
                                        masks['A_mask'], masks['V_mask'])
        return jnp.argmax(lp, axis=-1)

    t_step = best_of(lambda: one_step(params, state0, tok))
    print(f'one step         {t_step * 1e3:8.3f} ms  '
          f'(x{MAX_LEN} = {t_step * MAX_LEN * 1e3:.3f} ms)')

    # --- full decode ---------------------------------------------------------
    t_full = best_of(lambda: greedy_decode_bimodal(
        params, dims, stacks, MAX_LEN, 2, -1, 1))
    print(f'full decode      {t_full * 1e3:8.3f} ms  '
          f'-> {B / t_full:.0f} caps/sec')

    # --- full decode with the int8 cross-KV cache ----------------------------
    t_q8 = best_of(lambda: greedy_decode_bimodal(
        params, dims, stacks, MAX_LEN, 2, -1, 1, kv_int8=True))
    print(f'full decode q8   {t_q8 * 1e3:8.3f} ms  '
          f'-> {B / t_q8:.0f} caps/sec')

    # token agreement bf16 vs int8-KV at flagship shapes (random weights)
    tok_f = np.asarray(greedy_decode_bimodal(params, dims, stacks, MAX_LEN,
                                             2, -1, 1))
    tok_q = np.asarray(greedy_decode_bimodal(params, dims, stacks, MAX_LEN,
                                             2, -1, 1, kv_int8=True))
    agree = float((tok_f == tok_q).mean())
    print(f'token agreement  {agree * 100:7.2f} %')


if __name__ == '__main__':
    main()
