'''Benchmark: greedy caption decode throughput (captions/sec/chip) plus
teacher-forced train-step throughput (samples/sec) and an MFU estimate.

Headline metric per BASELINE.json: batched KV-cached greedy decode vs the
reference's un-cached algorithm. The reference publishes no captions/sec
(BASELINE.md), so ``vs_baseline`` is the measured speedup over the
reference's decode *algorithm* (full prefix re-encode per token,
reference: captioning_epoch_loops.py:39-65) run on the SAME chip with the
same model/shapes — an apples-to-apples algorithmic baseline.

Both the decode and the train step are measured with attention_impl 'xla'
and 'pallas'; the faster decode impl carries the headline number and all
four timings are reported as extra fields of the ONE output JSON line:

{"metric", "value", "unit", "vs_baseline",
 "decode_xla_caps_per_sec", "decode_pallas_caps_per_sec", "decode_impl",
 "decode_int8kv_caps_per_sec", "decode_int8w_caps_per_sec",
 "train_samples_per_sec", "train_step_ms", "train_mfu",
 "train_xla_ms", "train_pallas_ms", "train_impl"}

NB: the benchmark chip sits behind a time-shared tunnel with ~20x run-to-run
variance; every number is best-of-N and only large ratios are meaningful.
'''
import json
import os
import sys
import threading
import time

import numpy as np

# v5e bf16 peak; override for other chips (v4: 275e12, v5p: 459e12)
PEAK_FLOPS = float(os.environ.get('BMT_PEAK_FLOPS', 197e12))

# ---------------------------------------------------------------------------
# Watchdog: the bench chip sits behind a tunnel that sometimes dies for
# hours, and a dead tunnel blocks inside a device call where Python signals
# cannot interrupt — without a deadline the whole bench (and the round's
# deliverable) hangs with ZERO output. The watchdog thread emits the best
# PARTIAL result at the deadline and hard-exits; sections completed so far
# are recorded in _RESULT as they land. BMT_BENCH_DEADLINE=0 disables.
# ---------------------------------------------------------------------------
_RESULT: dict = {}
_DONE = threading.Event()


def _stage(name: str):
    '''Progress breadcrumb on stderr so a hang is attributable.'''
    print(f'[bench {time.strftime("%H:%M:%S")}] {name}', file=sys.stderr,
          flush=True)


def _start_watchdog():
    deadline = float(os.environ.get('BMT_BENCH_DEADLINE', 2400))
    if deadline <= 0:
        return

    def run():
        if _DONE.wait(deadline):
            return
        if _RESULT.get('value'):
            print(json.dumps(_RESULT), flush=True)
            print(f'bench watchdog: {deadline:.0f}s deadline hit; emitted '
                  f'partial result (device likely stalled)', file=sys.stderr)
            os._exit(0)
        print(f'bench watchdog: {deadline:.0f}s deadline hit with no usable '
              f'metrics (device never answered)', file=sys.stderr)
        os._exit(3)

    threading.Thread(target=run, daemon=True, name='bench-watchdog').start()


def _env_int(name, default):
    '''Shape/iteration overrides so tests can smoke the REAL bench script
    on CPU with tiny shapes (tests/test_driver_deliverables.py). Defaults
    are the measured flagship configuration.'''
    return int(os.environ.get(name, default))


def _warmup(fn, attempts=3):
    '''The remote-compile tunnel occasionally drops mid-compile; retry
    (the persistent cache resumes from completed compiles).'''
    for i in range(attempts):
        try:
            return np.asarray(fn())
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f'warmup retry after: {type(e).__name__}', file=sys.stderr)


def _time_best(fn, iters, reps):
    '''Best-of-reps mean seconds per call. The axon backend's
    block_until_ready is a no-op; np.asarray forces the host sync.'''
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    _start_watchdog()
    _stage('importing jax / initializing backend')
    import jax
    import jax.numpy as jnp
    from bmt_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    from bmt_tpu.decode import greedy_decode_bimodal
    from bmt_tpu.models import (CapModelDims, bimodal_transformer_forward,
                                init_bimodal_transformer)
    from bmt_tpu.ops.masks import make_masks
    from bmt_tpu.train.optim import build_optimizer
    from bmt_tpu.train.steps import init_train_state, make_cap_train_step

    on_tpu = jax.default_backend() not in ('cpu',)
    impls = ('xla', 'pallas') if on_tpu else ('xla',)

    # flagship architecture, inference batch like the reference's val loop
    # (inference_batch_size = 64 at B=32); realistic val segment lengths.
    # end_idx is set to an unreachable token so BOTH paths decode the full
    # 30 steps (random weights would otherwise early-stop unrepresentatively)
    VOC = _env_int('BMT_BENCH_VOC', 10172)
    B = _env_int('BMT_BENCH_B', 64)
    Sa = _env_int('BMT_BENCH_SA', 256)
    Sv = _env_int('BMT_BENCH_SV', 96)
    MAX_LEN = _env_int('BMT_BENCH_MAX_LEN', 30)
    ITERS = _env_int('BMT_BENCH_ITERS', 10)
    REPS = _env_int('BMT_BENCH_REPS', 4)
    END_IDX = -1
    dims = CapModelDims(voc_size=VOC)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)

    # cast params to bfloat16 for MXU throughput (decode is inference-only)
    bf16 = jnp.bfloat16
    params_bf16 = jax.tree.map(
        lambda x: x.astype(bf16) if x.dtype == jnp.float32 else x, params)

    rng = np.random.default_rng(0)
    stacks = {
        'rgb': jnp.asarray(rng.normal(size=(B, Sv, 1024)), bf16),
        'flow': jnp.asarray(rng.normal(size=(B, Sv, 1024)), bf16),
        'audio': jnp.asarray(rng.normal(size=(B, Sa, 128)), bf16),
    }

    # ---- greedy decode: xla vs pallas ------------------------------------
    decode_caps = {}
    for impl in impls:
        _stage(f'decode[{impl}]')

        def cached_decode(impl=impl):
            return greedy_decode_bimodal(params_bf16, dims, stacks, MAX_LEN,
                                         2, END_IDX, 1, attention_impl=impl)
        try:
            _warmup(cached_decode)
            _warmup(cached_decode)  # 2nd: first real exec can include the
            # one-time weight upload over the device tunnel
            decode_caps[impl] = B / _time_best(cached_decode,
                                               iters=ITERS, reps=REPS)
        except Exception as e:
            print(f'decode[{impl}] failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    if not decode_caps:
        raise RuntimeError('every decode impl failed; see stderr above')
    decode_impl = max(decode_caps, key=decode_caps.get)
    captions_per_sec = decode_caps[decode_impl]
    # watchdog partial: the headline is usable even if later stages stall
    _RESULT.update({
        'metric': 'greedy_decode_captions_per_sec_per_chip',
        'value': round(captions_per_sec, 2), 'unit': 'captions/sec',
        'vs_baseline': None, 'decode_impl': decode_impl,
        'partial': True,
    })
    for impl, v in decode_caps.items():
        _RESULT[f'decode_{impl}_caps_per_sec'] = round(v, 2)

    # optional int8 cross-KV cache (--kv_cache_int8): reported as a field,
    # NOT the headline — it perturbs logits by quantization noise, and the
    # headline number must reflect reference-parity decoding.
    decode_q8 = None
    try:
        _stage('decode[int8kv]')

        def q8_decode():
            return greedy_decode_bimodal(params_bf16, dims, stacks, MAX_LEN,
                                         2, END_IDX, 1, kv_int8=True)
        _warmup(q8_decode)
        _warmup(q8_decode)
        decode_q8 = B / _time_best(q8_decode, iters=ITERS, reps=REPS)
    except Exception as e:
        print(f'decode[int8kv] failed: {type(e).__name__}: {e}',
              file=sys.stderr)

    # optional weight-only int8 decode (--weights_int8, ops/quant.py),
    # composed with the int8 KV cache — the full quantized serving path.
    # Also a field, not the headline, for the same parity reason.
    decode_w8 = None
    try:
        _stage('decode[int8w]')
        from bmt_tpu.ops.quant import quantize_tree_int8
        params_w8 = quantize_tree_int8(params_bf16)

        def w8_decode():
            return greedy_decode_bimodal(params_w8, dims, stacks, MAX_LEN,
                                         2, END_IDX, 1, kv_int8=True)
        _warmup(w8_decode)
        _warmup(w8_decode)
        decode_w8 = B / _time_best(w8_decode, iters=ITERS, reps=REPS)
    except Exception as e:
        print(f'decode[int8w] failed: {type(e).__name__}: {e}',
              file=sys.stderr)

    # ---- reference decode algorithm on the same chip ----------------------
    # Full re-encode of the whole prefix each step, no KV cache
    # (captioning_epoch_loops.py:39-65). Kept fully on-device (no host sync
    # inside the loop) so the baseline is not penalized by host<->device
    # latency: the prefix lives in a fixed (B, MAX_LEN+1) buffer with pad
    # masking — per-step cost is dominated by the encoder re-run, matching
    # the reference's profile.
    @jax.jit
    def uncached_step(p, stacks, trg, step):
        masks = make_masks(stacks, trg, 'audio_video', 1)
        preds = bimodal_transformer_forward(p, dims, stacks, trg, masks,
                                            deterministic=True)
        row = jax.lax.dynamic_index_in_dim(preds, step, axis=1,
                                           keepdims=False)
        nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice_in_dim(
            trg, nxt[:, None], step + 1, axis=1)

    def uncached_decode():
        trg = jnp.full((B, MAX_LEN + 1), 1, jnp.int32).at[:, 0].set(2)
        for step in range(MAX_LEN):
            trg = uncached_step(params_bf16, stacks, trg, jnp.int32(step))
        return np.asarray(trg)

    _stage('reference uncached decode baseline')
    _warmup(uncached_decode)
    # best-of-3 like the cached path, so vs_baseline is not dominated by
    # the tunnel's run-to-run variance on a single baseline sample
    uncached_sec = _time_best(uncached_decode, iters=1,
                              reps=min(REPS, 3))
    baseline_caps_per_sec = B / uncached_sec
    _RESULT['vs_baseline'] = round(captions_per_sec / baseline_caps_per_sec,
                                   2)

    # ---- teacher-forced train step: samples/sec + MFU ---------------------
    # Reference training batch (B=32, scripts/train_captioning_module.py),
    # bf16 compute / fp32 params+optimizer like the real trainer.
    TB = _env_int('BMT_BENCH_TB', 32)
    Sc = _env_int('BMT_BENCH_SC', 22)

    class _Cfg:
        optimizer = 'adam'
        lr = 5e-5
        grad_clip = 1.0
        weight_decay = 0.0
        beta1, beta2, eps = 0.9, 0.999, 1e-8

    optimizer = build_optimizer(_Cfg())
    captions = np.full((TB, Sc), 1, np.int32)
    captions[:, 0] = 2
    captions[:, 1:-2] = rng.integers(4, VOC, size=(TB, Sc - 3))
    captions[:, -2] = 3
    train_batch = {
        'src': {
            'rgb': jnp.asarray(rng.normal(size=(TB, Sv, 1024)), jnp.float32),
            'flow': jnp.asarray(rng.normal(size=(TB, Sv, 1024)), jnp.float32),
            'audio': jnp.asarray(rng.normal(size=(TB, Sa, 128)), jnp.float32),
        },
        'caption': jnp.asarray(captions),
    }

    train_ms, train_flops = {}, None
    for impl in impls:
        _stage(f'train[{impl}]')
        step_fn = jax.jit(make_cap_train_step(dims, optimizer, 0.7, 1,
                                              attention_impl=impl,
                                              compute_dtype=bf16))
        # rbg = the trainers' default dropout PRNG (hardware RNG on TPU)
        state = init_train_state(params, optimizer, prng_impl='rbg')
        try:
            if impl == 'xla':
                try:
                    cost = step_fn.lower(state, train_batch).compile() \
                        .cost_analysis()
                    if isinstance(cost, (list, tuple)):
                        cost = cost[0]
                    train_flops = float(cost.get('flops', 0.0)) or None
                except Exception:
                    train_flops = None

            def train_once(step_fn=step_fn, state=state):
                _, metrics = step_fn(state, train_batch)
                return metrics['loss']
            _warmup(train_once)
            _warmup(train_once)
            train_ms[impl] = _time_best(train_once, iters=ITERS,
                                        reps=REPS) * 1e3
        except Exception as e:
            print(f'train[{impl}] failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    if not train_ms:
        raise RuntimeError('every train impl failed; see stderr above')
    train_impl = min(train_ms, key=train_ms.get)
    step_ms = train_ms[train_impl]
    mfu = (train_flops / (step_ms / 1e3) / PEAK_FLOPS
           if train_flops else None)
    _RESULT.update({
        'train_impl': train_impl,
        'train_samples_per_sec': round(TB / (step_ms / 1e3), 2),
        'train_step_ms': round(step_ms, 3),
        'train_mfu': round(mfu, 4) if mfu is not None else None,
    })

    # ---- LoRA finetune step (frozen-subtree gradient pruning) -------------
    # Same shapes as the full train step, rank-8 adapters on attn+FFN
    # linears, base frozen: the pruned backward skips every base dW GEMM
    # (0.707x the compiled FLOPs — DESIGN 6b). Measured right after the
    # full step so the two share a throttling window. BMT_BENCH_LORA=0
    # skips.
    lora_ms = None
    if os.environ.get('BMT_BENCH_LORA', '1') != '0':
        _stage('train[lora]')
        try:
            from bmt_tpu.ops.lora import add_lora, lora_frozen_predicate
            from bmt_tpu.train.optim import freeze_mask

            class _LoraCfg(_Cfg):
                lora_rank = 8

            lparams = add_lora(params, 8, jax.random.PRNGKey(7),
                               targets='attn_ffn')
            lmask = freeze_mask(lparams, lora_frozen_predicate)
            lopt = build_optimizer(_LoraCfg(), frozen_mask=lmask)
            # same attention impl as the winning full step, so the
            # published ratio isolates the pruning gain instead of
            # conflating it with the xla-vs-pallas attention delta
            lstep = jax.jit(make_cap_train_step(dims, lopt, 0.7, 1,
                                                attention_impl=train_impl,
                                                compute_dtype=bf16,
                                                frozen_mask=lmask))
            lstate = init_train_state(lparams, lopt, prng_impl='rbg')

            def lora_once():
                _, m = lstep(lstate, train_batch)
                return m['loss']
            _warmup(lora_once)
            _warmup(lora_once)
            lora_ms = _time_best(lora_once, iters=ITERS, reps=REPS) * 1e3
            _RESULT.update({
                'train_lora_step_ms': round(lora_ms, 3),
                'train_lora_speedup': round(step_ms / lora_ms, 3),
            })
        except Exception as e:
            print(f'lora train bench failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # ---- proposal-generator train step (stage 2) --------------------------
    # Flagship prop shapes: B=16, padded 800 audio / 300 video rows, all 20
    # conv heads (reference: scripts/train_proposal_generator.py defaults).
    # BMT_BENCH_PROP=0 skips; the smoke test shrinks via BMT_BENCH_P* env.
    prop_ms = prop_mfu = None
    if os.environ.get('BMT_BENCH_PROP', '1') != '0':
        _stage('prop train step')
        from bmt_tpu.models import (PropModelDims,
                                    init_multimodal_proposal_generator)
        from bmt_tpu.train.steps import make_prop_train_step
        PB = _env_int('BMT_BENCH_PB', 16)
        PSa = _env_int('BMT_BENCH_PSA', 800)
        PSv = _env_int('BMT_BENCH_PSV', 300)
        pdm = _env_int('BMT_BENCH_PDM', 0)   # smoke override: tiny widths
        if pdm:
            pdims = PropModelDims(
                d_model_A=max(pdm // 4, 4), d_model_V=pdm, d_model=pdm,
                H=2, N=1, d_ff_A=pdm, d_ff_V=pdm, d_vid=1024, d_aud=128,
                use_linear_embedder=True, kernel_sizes_A=(3, 5),
                kernel_sizes_V=(3, 5), conv_layers_A=(8,),
                conv_layers_V=(8,), anchors_num_A=2, anchors_num_V=2)
        else:
            pdims = PropModelDims(remat=True)  # the prop trainer's default
        try:
            pparams = init_multimodal_proposal_generator(
                jax.random.PRNGKey(1), pdims)
            pparams['anchors_A'] = jnp.asarray(
                np.linspace(2.0, 300.0, pdims.anchors_num_A), jnp.float32)
            pparams['anchors_V'] = jnp.asarray(
                np.linspace(3.0, 400.0, pdims.anchors_num_V), jnp.float32)
            popt = build_optimizer(_Cfg())
            pstep = jax.jit(make_prop_train_step(pdims, popt, 1,
                                                 compute_dtype=bf16))
            pstate = init_train_state(pparams, popt, prng_impl='rbg')
            E = 6
            pbatch = {
                'src': {
                    'rgb': jnp.asarray(
                        rng.normal(size=(PB, PSv, 1024)), jnp.float32),
                    'flow': jnp.asarray(
                        rng.normal(size=(PB, PSv, 1024)), jnp.float32),
                    'audio': jnp.asarray(
                        rng.normal(size=(PB, PSa, 128)), jnp.float32),
                },
                'centers': jnp.asarray(
                    rng.uniform(5, 700, size=(PB, E)), jnp.float32),
                'lengths': jnp.asarray(
                    rng.uniform(2, 60, size=(PB, E)), jnp.float32),
                'valid': jnp.ones((PB, E), bool),
            }
            prop_flops = None
            try:
                pcost = pstep.lower(pstate, pbatch).compile().cost_analysis()
                if isinstance(pcost, (list, tuple)):
                    pcost = pcost[0]
                prop_flops = float(pcost.get('flops', 0.0)) or None
            except Exception:
                pass

            def prop_once():
                _, m = pstep(pstate, pbatch)
                return m['loss']
            _warmup(prop_once)
            _warmup(prop_once)
            prop_ms = _time_best(prop_once, iters=max(ITERS // 2, 1),
                                 reps=min(REPS, 3)) * 1e3
            prop_mfu = (prop_flops / (prop_ms / 1e3) / PEAK_FLOPS
                        if prop_flops else None)
        except Exception as e:
            print(f'prop train bench failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    result = {
        'metric': 'greedy_decode_captions_per_sec_per_chip',
        'value': round(captions_per_sec, 2),
        'unit': 'captions/sec',
        'vs_baseline': round(captions_per_sec / baseline_caps_per_sec, 2),
        'decode_impl': decode_impl,
        'train_impl': train_impl,
        'train_samples_per_sec': round(TB / (step_ms / 1e3), 2),
        'train_step_ms': round(step_ms, 3),
        'train_mfu': round(mfu, 4) if mfu is not None else None,
    }
    for impl in impls:
        if impl in decode_caps:
            result[f'decode_{impl}_caps_per_sec'] = round(decode_caps[impl],
                                                          2)
        if impl in train_ms:
            result[f'train_{impl}_ms'] = round(train_ms[impl], 3)
    if decode_q8 is not None:
        result['decode_int8kv_caps_per_sec'] = round(decode_q8, 2)
    if decode_w8 is not None:
        result['decode_int8w_caps_per_sec'] = round(decode_w8, 2)
    if lora_ms is not None:
        result['train_lora_step_ms'] = round(lora_ms, 3)
        # same-window ratio vs the full step (the trustworthy comparison
        # on the time-shared tunnel)
        result['train_lora_speedup'] = round(step_ms / lora_ms, 3)
    if prop_ms is not None:
        result['prop_train_step_ms'] = round(prop_ms, 3)
        result['prop_train_videos_per_sec'] = round(
            _env_int('BMT_BENCH_PB', 16) / (prop_ms / 1e3), 2)
        if prop_mfu is not None:
            result['prop_train_mfu'] = round(prop_mfu, 4)
    _DONE.set()   # full run: the watchdog must not also print
    print(json.dumps(result))


if __name__ == '__main__':
    main()
