'''Benchmark: greedy caption decode throughput (captions/sec/chip) plus
teacher-forced train-step throughput (samples/sec) and an MFU estimate.

Headline metric per BASELINE.json: batched KV-cached greedy decode vs the
reference's un-cached algorithm. The reference publishes no captions/sec
(BASELINE.md), so ``vs_baseline`` is the measured speedup over the
reference's decode *algorithm* (full prefix re-encode per token,
reference: captioning_epoch_loops.py:39-65) run on the SAME chip with the
same model/shapes — an apples-to-apples algorithmic baseline.

Statistics: every timed section reports best-of-reps AND the median rep
(`*_p50` fields) so the scoreboard carries its own spread evidence — the
bench chip sits behind a time-shared tunnel with large run-to-run
variance, and a best-only number can't be told apart from a lucky
window. Competing variants (cached vs uncached decode; xla vs pallas vs
LoRA train) are timed INTERLEAVED rep-by-rep in one window, and every
ratio field is the MEDIAN OF PER-REP PAIRED RATIOS (_paired_ratio) so
drift between reps cancels. `*_device_*` fields come from jax-profiler
traces of the same executables — the device truth a directly-attached
host would measure, reproducible to ~0.3% regardless of tunnel weather
(docs/SCOREBOARD.md documents every field).

The Sq=1 cached decode steps auto-dispatch to the XLA formulation even
under --attention_impl pallas (ops/attention.py; a measured ~2x loss for
the fused kernel there), so the old full-decode pallas A/B is gone.
Instead the bench guards the régime where the tiled kernel genuinely
wins (docs/DESIGN.md §6: ~1.2x at S=2048, ~2.65x at S=4096): an
attention-only xla-vs-pallas regression check at S in {2048, 4096},
reported as `attn_s{S}_{impl}_ms` + `attn_pallas_speedup_s{S}` (the
timed fns reduce on-device so the tunnel's result transfer is not what
gets measured).

One output JSON line: {"metric", "value", "unit", "vs_baseline", ...}
with per-section fields (decode_*, train_*, prop_*, attn_*, serving_*),
each with a `_p50` companion where timed. Non-greedy decoders (beam K=4,
temperature sampling, top-p) get their own fields, and a final
`warnings` list turns the recorded guard ratios into actual floors —
non-empty whenever a headline ratio regressed below its floor.
'''
import json
import os
import statistics
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


def _time_once(fn, iters):
    '''Mean seconds per call over one back-to-back burst. The axon
    backend's block_until_ready is a no-op; np.asarray forces the sync.'''
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def _stats(samples):
    '''(best, p50) of per-rep means.'''
    return min(samples), statistics.median(samples)


def _time_interleaved(fns: dict, reps: int) -> dict:
    '''Round-robin reps across named (fn, iters) pairs so every variant
    samples the SAME tunnel window — ratios between them are then
    insensitive to slow drift in the shared chip's load. All fns must be
    compiled (warmed) before entry. Returns {name: (best, p50, samples)}
    seconds, where samples is the per-rep list (for paired ratios).'''
    times = {k: [] for k in fns}
    for _ in range(reps):
        for name, (fn, iters) in fns.items():
            times[name].append(_time_once(fn, iters))
    return {k: _stats(v) + (v,) for k, v in times.items()}


def _paired_ratio(stats, num: str, den: str) -> float:
    '''Median of per-rep ratios num/den — each rep times both variants
    back-to-back, so the ratio cancels whatever the tunnel was doing in
    that second. Far more drift-robust than a ratio of medians (two
    medians can come from different reps' weather).'''
    ns, ds = stats[num][2], stats[den][2]
    return statistics.median(n / d for n, d in zip(ns, ds))


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
    REPS = _env_int('BMT_BENCH_REPS', 5)
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

    # ---- decode: cached (headline) / int8kv / int8w / uncached baseline --
    # All variants compiled first, then timed interleaved in ONE window so
    # vs_baseline and the quantization ratios share tunnel weather.
    def cached_decode():
        return greedy_decode_bimodal(params_bf16, dims, stacks, MAX_LEN,
                                     2, END_IDX, 1)

    _stage('decode[xla] compile')
    _warmup(cached_decode)
    _warmup(cached_decode)  # 2nd: first real exec can include the
    # one-time weight upload over the device tunnel

    decode_fns = {'xla': (cached_decode, ITERS)}

    # optional int8 cross-KV cache (--kv_cache_int8): reported as a field,
    # NOT the headline — it perturbs logits by quantization noise, and the
    # headline number must reflect reference-parity decoding.
    try:
        _stage('decode[int8kv] compile')

        def q8_decode():
            return greedy_decode_bimodal(params_bf16, dims, stacks, MAX_LEN,
                                         2, END_IDX, 1, kv_int8=True)
        _warmup(q8_decode)
        _warmup(q8_decode)
        decode_fns['int8kv'] = (q8_decode, ITERS)
    except Exception as e:
        print(f'decode[int8kv] failed: {type(e).__name__}: {e}',
              file=sys.stderr)

    # optional weight-only int8 decode (--weights_int8, ops/quant.py),
    # composed with the int8 KV cache — the full quantized serving path.
    try:
        _stage('decode[int8w] compile')
        from bmt_tpu.ops.quant import quantize_tree_int8
        params_w8 = quantize_tree_int8(params_bf16)

        def w8_decode():
            return greedy_decode_bimodal(params_w8, dims, stacks, MAX_LEN,
                                         2, END_IDX, 1, kv_int8=True)
        _warmup(w8_decode)
        _warmup(w8_decode)
        decode_fns['int8w'] = (w8_decode, ITERS)
    except Exception as e:
        print(f'decode[int8w] failed: {type(e).__name__}: {e}',
              file=sys.stderr)

    # beam (K=4) and sampling decoders: round-over-round regression fields
    # for the non-greedy decode paths (decode/beam.py's cross-KV sharing,
    # decode/sample.py's filtered sampling) — a silent regression there
    # would otherwise never show in the scoreboard. BMT_BENCH_ALTDECODE=0
    # skips both.
    if os.environ.get('BMT_BENCH_ALTDECODE', '1') != '0':
        try:
            _stage('decode[beam4] compile')
            from bmt_tpu.decode import beam_search_bimodal

            def beam_decode():
                return beam_search_bimodal(params_bf16, dims, stacks,
                                           MAX_LEN, 2, END_IDX, 1,
                                           beam_size=4)[0]
            _warmup(beam_decode)
            _warmup(beam_decode)
            decode_fns['beam4'] = (beam_decode, max(1, ITERS // 3))
        except Exception as e:
            print(f'decode[beam4] failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
        try:
            _stage('decode[sample] compile')
            from bmt_tpu.decode import sample_decode_bimodal
            skey = jax.random.key(11, impl='rbg')

            def sample_decode():
                return sample_decode_bimodal(params_bf16, dims, stacks,
                                             skey, MAX_LEN, 2, END_IDX, 1,
                                             temperature=1.0)

            def sample_topp_decode():
                # top-p 0.9: the expensive variant (per-step vocab sort)
                return sample_decode_bimodal(params_bf16, dims, stacks,
                                             skey, MAX_LEN, 2, END_IDX, 1,
                                             temperature=1.0, top_p=0.9)
            _warmup(sample_decode)
            _warmup(sample_decode)
            decode_fns['sample'] = (sample_decode, max(1, ITERS // 2))
            _warmup(sample_topp_decode)
            _warmup(sample_topp_decode)
            decode_fns['sample_topp'] = (sample_topp_decode,
                                         max(1, ITERS // 2))
        except Exception as e:
            print(f'decode[sample] failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # multi-batch decode bundling: K decode batches lax.scan'ed into ONE
    # dispatch (the eval loop's decode is one dispatch per batch; this
    # field isolates how much of the per-batch decode cost is the
    # tunnel's per-dispatch launch floor rather than device work). Same
    # parity-exact decode — only the dispatch granularity changes.
    DECODE_K = _env_int('BMT_BENCH_DECODE_BUNDLE_K', 4)
    if DECODE_K > 1:
        try:
            _stage('decode[bundled] compile')
            stacked_stacks = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (DECODE_K,) + x.shape), stacks)

            @jax.jit
            def bundled_decode_fn(p, ss):
                def body(carry, s):
                    return carry, greedy_decode_bimodal(
                        p, dims, s, MAX_LEN, 2, END_IDX, 1)
                _, toks = jax.lax.scan(body, jnp.int32(0), ss)
                return toks

            def bundled_decode():
                return bundled_decode_fn(params_bf16, stacked_stacks)
            _warmup(bundled_decode)
            _warmup(bundled_decode)
            decode_fns['bundled'] = (bundled_decode,
                                     max(1, ITERS // DECODE_K))
        except Exception as e:
            print(f'decode[bundled] failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # reference decode algorithm on the same chip: full re-encode of the
    # whole prefix each step, no KV cache (captioning_epoch_loops.py:39-65).
    # Kept fully on-device (no host sync inside the loop) so the baseline
    # is not penalized by host<->device latency: the prefix lives in a
    # fixed (B, MAX_LEN+1) buffer with pad masking — per-step cost is
    # dominated by the encoder re-run, matching the reference's profile.
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

    _stage('decode[uncached baseline] compile')
    _warmup(uncached_decode)
    decode_fns['uncached'] = (uncached_decode, 1)

    _stage(f'decode: interleaved timing x{REPS} reps')
    dstats = _time_interleaved(decode_fns, REPS)
    best_s, p50_s = dstats['xla'][:2]
    captions_per_sec = B / best_s
    captions_p50 = B / p50_s
    base_best = dstats['uncached'][0]
    _RESULT.update({
        'metric': 'greedy_decode_captions_per_sec_per_chip',
        'value': round(captions_per_sec, 2), 'unit': 'captions/sec',
        'value_p50': round(captions_p50, 2),
        'vs_baseline': round(base_best / best_s, 2),
        # median of PER-REP ratios: each rep times both algorithms
        # back-to-back, so the ratio is immune to drift between reps
        # (a ratio of two medians is not — they can pair different
        # reps' tunnel weather)
        'vs_baseline_p50': round(_paired_ratio(dstats, 'uncached', 'xla'),
                                 2),
        'decode_impl': 'xla',   # steps auto-dispatch; see module docstring
        'decode_xla_caps_per_sec': round(captions_per_sec, 2),
        'decode_xla_caps_p50': round(captions_p50, 2),
        'baseline_uncached_caps_per_sec': round(B / base_best, 2),
        'partial': True,
    })
    for name in ('int8kv', 'int8w', 'beam4', 'sample', 'sample_topp'):
        if name in dstats:
            db, dp = dstats[name][:2]
            _RESULT[f'decode_{name}_caps_per_sec'] = round(B / db, 2)
            _RESULT[f'decode_{name}_caps_p50'] = round(B / dp, 2)
    if 'bundled' in dstats:
        # one call decodes DECODE_K batches; normalize to per-batch
        db, dp = (t / DECODE_K for t in dstats['bundled'][:2])
        _RESULT.update({
            'decode_bundle_k': DECODE_K,
            'decode_bundled_caps_per_sec': round(B / db, 2),
            'decode_bundled_caps_p50': round(B / dp, 2),
        })

    # ---- decode device-time trace -----------------------------------------
    # Same instrument as the train stage below: the headline caps/sec is
    # wall-clock behind a time-shared tunnel; the traced DEVICE time is
    # what a directly-attached host would measure (round 5: 12.3 ms/batch
    # = ~5200 caps/s, at the decode's cross-KV read roofline, DESIGN §6a).
    if on_tpu and os.environ.get('BMT_BENCH_DEVICE_TRACE', '1') != '0':
        try:
            _stage('decode device-time trace')
            import shutil
            import tempfile
            from bmt_tpu.utils.profiling import (trace,
                                                 trace_device_ms_per_exec)
            tdir = tempfile.mkdtemp(prefix='bmt_bench_dtrace_')
            try:
                ND = 3
                with trace(tdir):
                    out = None
                    for _ in range(ND):
                        out = cached_decode()
                    np.asarray(out)
                ddev_ms = trace_device_ms_per_exec(tdir, ND)
                _RESULT['decode_device_batch_ms'] = round(ddev_ms, 3)
                _RESULT['decode_device_caps_per_sec'] = round(
                    B / (ddev_ms / 1e3), 2)
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
            if 'int8kv' in decode_fns:
                # the int8-KV variant's device time too, so DESIGN §6a's
                # quantization arithmetic stays scoreboard-verifiable
                tdir8 = tempfile.mkdtemp(prefix='bmt_bench_dtrace8_')
                try:
                    q8_fn = decode_fns['int8kv'][0]
                    with trace(tdir8):
                        out = None
                        for _ in range(ND):
                            out = q8_fn()
                        np.asarray(out)
                    qdev_ms = trace_device_ms_per_exec(tdir8, ND)
                    _RESULT['decode_int8kv_device_batch_ms'] = round(
                        qdev_ms, 3)
                    _RESULT['decode_int8kv_device_caps_per_sec'] = round(
                        B / (qdev_ms / 1e3), 2)
                finally:
                    shutil.rmtree(tdir8, ignore_errors=True)
        except Exception as e:
            print(f'decode device trace failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # ---- attention-only tiled-kernel regression guard ----------------------
    # The régime where the Pallas kernel matters: long sequences, where
    # XLA round-trips the (Sq, Sk) logits through HBM and the tiled
    # online-softmax kernel streams them through VMEM (DESIGN §6:
    # 1.2x @2048, 2.65x @4096 measured round 4). S=1024 is deliberately
    # NOT guarded: both impls take only ~1 ms of device time there, so
    # the wall ratio is dominated by per-call overhead / window noise. TPU-only: in interpreter mode
    # the kernel is orders of magnitude slower and the guard would be
    # meaningless. BMT_BENCH_ATTN=0 skips.
    if on_tpu and os.environ.get('BMT_BENCH_ATTN', '1') != '0':
        from bmt_tpu.ops.attention import scaled_dot_attention
        from bmt_tpu.ops.pallas_attention import flash_attention
        AB, AH, AD = 8, 4, 256
        for S in (2048, 4096):
            try:
                _stage(f'attn guard S={S}')
                qa = jnp.asarray(rng.normal(size=(AB, AH, S, AD)), bf16)
                ka = jnp.asarray(rng.normal(size=(AB, AH, S, AD)), bf16)
                va = jnp.asarray(rng.normal(size=(AB, AH, S, AD)), bf16)
                kmask = np.ones((AB, 1, 1, S), bool)
                kmask[..., int(S * 0.9):] = False   # 10% key padding
                ma = jnp.asarray(kmask)
                # .sum() keeps the timed quantity ON-DEVICE: this host's
                # tunnel round-trips each execute's literal result, so
                # returning the (B, H, S, d) output would time a ~17-67MB
                # host transfer (~40-190 ms) instead of the attention
                # (~3-12 ms). The reduction is symmetric across impls.
                xla_fn = jax.jit(
                    lambda q, k, v, m: scaled_dot_attention(q, k, v,
                                                            m).sum())
                pal_fn = jax.jit(
                    lambda q, k, v, m: flash_attention(q, k, v, m).sum())
                _warmup(lambda: xla_fn(qa, ka, va, ma))
                _warmup(lambda: pal_fn(qa, ka, va, ma))
                astats = _time_interleaved({
                    'xla': (lambda: xla_fn(qa, ka, va, ma), ITERS),
                    'pallas': (lambda: pal_fn(qa, ka, va, ma), ITERS),
                }, REPS)
                xb, xp = astats['xla'][:2]
                pb, pp = astats['pallas'][:2]
                _RESULT.update({
                    f'attn_s{S}_xla_ms': round(xb * 1e3, 3),
                    f'attn_s{S}_pallas_ms': round(pb * 1e3, 3),
                    f'attn_s{S}_xla_ms_p50': round(xp * 1e3, 3),
                    f'attn_s{S}_pallas_ms_p50': round(pp * 1e3, 3),
                    # the regression-guard ratio: median of per-rep
                    # ratios (paired same-second comparison)
                    f'attn_pallas_speedup_s{S}': round(
                        _paired_ratio(astats, 'xla', 'pallas'), 3),
                })
            except Exception as e:
                print(f'attn guard S={S} failed: {type(e).__name__}: {e}',
                      file=sys.stderr)

    # ---- teacher-forced train step: samples/sec + MFU ---------------------
    # Reference training batch (B=32, scripts/train_captioning_module.py),
    # bf16 compute / fp32 params+optimizer like the real trainer. The
    # state is DONATED and threaded through the timing loop exactly as in
    # cap_trainer (mesh.py jit_step donate_state=True) so the measured
    # step is the shipped executable, in-place buffer reuse included.
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

    impls = ('xla', 'pallas') if on_tpu else ('xla',)

    def fresh_params():
        '''Deep-copied param tree: every donated train state needs its OWN
        buffers — the step deletes its input state, and a later stage
        holding the same arrays would die with "Array has been deleted".'''
        return jax.tree.map(jnp.copy, params)

    train_fns, train_flops = {}, None
    step_fns = {}
    for impl in impls:
        _stage(f'train[{impl}] compile')
        step_fn = jax.jit(make_cap_train_step(dims, optimizer, 0.7, 1,
                                              attention_impl=impl,
                                              compute_dtype=bf16),
                          donate_argnums=(0,))
        step_fns[impl] = step_fn
        # rbg = the trainers' default dropout PRNG (hardware RNG on TPU)
        state = init_train_state(fresh_params(), optimizer, prng_impl='rbg')
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

            # donated state: thread it via a mutable cell, like the trainer
            cell = [state]

            def train_once(step_fn=step_fn, cell=cell):
                new_state, metrics = step_fn(cell[0], train_batch)
                cell[0] = new_state
                return metrics['loss']
            _warmup(train_once)
            _warmup(train_once)
            train_fns[impl] = (train_once, ITERS)
        except Exception as e:
            print(f'train[{impl}] failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    if not train_fns:
        raise RuntimeError('every train impl failed; see stderr above')

    # ---- LoRA finetune step (frozen-subtree gradient pruning) -------------
    # Same shapes as the full train step, rank-8 adapters on attn+FFN
    # linears, base frozen: the pruned backward skips every base dW GEMM
    # (0.707x the compiled FLOPs — DESIGN 6b). Interleaved with the full
    # step so train_lora_speedup is a same-window ratio. 'xla' attention
    # both sides (the measured winner at every BMT shape, DESIGN §6), so
    # the ratio isolates the pruning gain. BMT_BENCH_LORA=0 skips.
    if os.environ.get('BMT_BENCH_LORA', '1') != '0':
        _stage('train[lora] compile')
        try:
            from bmt_tpu.ops.lora import add_lora, lora_frozen_predicate
            from bmt_tpu.train.optim import freeze_mask

            class _LoraCfg(_Cfg):
                lora_rank = 8

            lparams = add_lora(fresh_params(), 8, jax.random.PRNGKey(7),
                               targets='attn_ffn')
            lmask = freeze_mask(lparams, lora_frozen_predicate)
            lopt = build_optimizer(_LoraCfg(), frozen_mask=lmask)
            lstep = jax.jit(make_cap_train_step(dims, lopt, 0.7, 1,
                                                attention_impl='xla',
                                                compute_dtype=bf16,
                                                frozen_mask=lmask),
                            donate_argnums=(0,))
            lcell = [init_train_state(lparams, lopt, prng_impl='rbg')]

            def lora_once():
                new_state, m = lstep(lcell[0], train_batch)
                lcell[0] = new_state
                return m['loss']
            _warmup(lora_once)
            _warmup(lora_once)
            train_fns['lora'] = (lora_once, ITERS)
        except Exception as e:
            print(f'lora train bench failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # ---- multi-step dispatch bundling (--steps_per_dispatch) --------------
    # K full optimizer steps scanned inside ONE dispatch (bit-identical to
    # sequential steps: tests/test_multistep.py). In THIS async timing
    # pattern expect ≈parity (dispatches pipeline; the scan adds no
    # device time — trace-verified, DESIGN §6b); the executable's true
    # device cost is the train_device_* trace fields, and bundling's
    # real win is the sync-per-step scenario measured right below.
    # Interleaved with the single-step variants; per-call time divided
    # by K after.
    BUNDLE_K = _env_int('BMT_BENCH_BUNDLE_K', 8)
    if BUNDLE_K > 1:
        _stage('train[bundled] compile')
        try:
            from bmt_tpu.train.steps import make_multistep
            bstep = jax.jit(make_multistep(
                make_cap_train_step(dims, optimizer, 0.7, 1,
                                    attention_impl='xla',
                                    compute_dtype=bf16)),
                donate_argnums=(0,))
            stacked_batch = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (BUNDLE_K,) + x.shape),
                train_batch)
            bcell = [init_train_state(fresh_params(), optimizer,
                                      prng_impl='rbg')]

            def bundled_once():
                new_state, m = bstep(bcell[0], stacked_batch)
                bcell[0] = new_state
                return m['loss']
            _warmup(bundled_once)
            _warmup(bundled_once)
            train_fns['bundled'] = (bundled_once,
                                    max(1, ITERS // BUNDLE_K))

            # the scenario bundling exists for (train/steps.py:
            # make_multistep): an epoch loop that READS the loss to host
            # every step (per-step logging, nonfinite guards — the
            # reference's own loop pattern, captioning_epoch_loops.py:
            # 145-147). Unbundled, that read puts a host->device round
            # trip on the critical path once per STEP; bundled, once per
            # K steps. These two fns time that pattern both ways in the
            # same interleaved window; the back-to-back async-dispatch
            # pattern above is the other bound (where bundling only has
            # to beat the scan's own overhead).
            xla_step = step_fns.get('xla')
            if xla_step is not None:
                scell = [init_train_state(fresh_params(), optimizer,
                                          prng_impl='rbg')]

                def sync_once():
                    new_state, m = xla_step(scell[0], train_batch)
                    scell[0] = new_state
                    return float(m['loss'])   # host sync EVERY step
                bscell = [init_train_state(fresh_params(), optimizer,
                                           prng_impl='rbg')]

                def bundled_sync_once():
                    new_state, m = bstep(bscell[0], stacked_batch)
                    bscell[0] = new_state
                    # one host sync for all K per-step losses
                    return np.asarray(m['loss'])[-1]
                sync_once()
                bundled_sync_once()
                train_fns['sync'] = (sync_once, ITERS)
                train_fns['bundled_sync'] = (bundled_sync_once,
                                             max(1, ITERS // BUNDLE_K))
        except Exception as e:
            print(f'bundled train bench failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    _stage(f'train: interleaved timing x{REPS} reps')
    tstats = _time_interleaved(train_fns, REPS)
    impl_stats = {k: v for k, v in tstats.items() if k in impls}
    train_impl = min(impl_stats, key=lambda k: impl_stats[k][0])
    step_best, step_p50 = tstats[train_impl][:2]
    step_ms, step_ms_p50 = step_best * 1e3, step_p50 * 1e3
    mfu = (train_flops / step_best / PEAK_FLOPS if train_flops else None)
    mfu_p50 = (train_flops / step_p50 / PEAK_FLOPS if train_flops else None)
    _RESULT.update({
        'train_impl': train_impl,
        'train_samples_per_sec': round(TB / step_best, 2),
        'train_samples_per_sec_p50': round(TB / step_p50, 2),
        'train_step_ms': round(step_ms, 3),
        'train_step_ms_p50': round(step_ms_p50, 3),
        'train_mfu': round(mfu, 4) if mfu is not None else None,
        'train_mfu_p50': round(mfu_p50, 4) if mfu_p50 is not None else None,
    })
    for impl in impls:
        if impl in tstats:
            _RESULT[f'train_{impl}_ms'] = round(tstats[impl][0] * 1e3, 3)
            _RESULT[f'train_{impl}_ms_p50'] = round(tstats[impl][1] * 1e3, 3)
    if 'lora' in tstats:
        lb, lp = tstats['lora'][:2]
        _RESULT.update({
            'train_lora_step_ms': round(lb * 1e3, 3),
            'train_lora_step_ms_p50': round(lp * 1e3, 3),
            # median of per-rep full/lora ratios (paired same-second)
            'train_lora_speedup': round(
                _paired_ratio(tstats, 'xla', 'lora'), 3)
            if 'xla' in tstats else round(step_p50 / lp, 3),
        })
    if 'bundled' in tstats:
        # one call = BUNDLE_K optimizer steps; normalize to per-step
        bb, bp = (t / BUNDLE_K for t in tstats['bundled'][:2])
        bmfu = (train_flops / bb / PEAK_FLOPS if train_flops else None)
        bmfu_p50 = (train_flops / bp / PEAK_FLOPS if train_flops else None)
        _RESULT.update({
            'train_bundled_k': BUNDLE_K,
            'train_bundled_step_ms': round(bb * 1e3, 3),
            'train_bundled_step_ms_p50': round(bp * 1e3, 3),
            'train_bundled_samples_per_sec': round(TB / bb, 2),
            'train_mfu_bundled': (round(bmfu, 4)
                                  if bmfu is not None else None),
            'train_mfu_bundled_p50': (round(bmfu_p50, 4)
                                      if bmfu_p50 is not None else None),
        })
    if 'sync' in tstats and 'bundled_sync' in tstats:
        sb, sp = tstats['sync'][:2]
        bsb, bsp = (t / BUNDLE_K for t in tstats['bundled_sync'][:2])
        _RESULT.update({
            'train_syncloop_step_ms': round(sb * 1e3, 3),
            'train_syncloop_step_ms_p50': round(sp * 1e3, 3),
            'train_bundled_syncloop_step_ms': round(bsb * 1e3, 3),
            'train_bundled_syncloop_step_ms_p50': round(bsp * 1e3, 3),
            # per-step speedup of bundling in the sync-per-step loop it
            # was built for: median of per-rep paired ratios, scaled by K
            'train_bundled_syncloop_speedup': round(
                _paired_ratio(tstats, 'sync', 'bundled_sync') * BUNDLE_K,
                3),
        })

    # ---- device-time train MFU (jax.profiler trace) -----------------------
    # The wall-based train_mfu above includes the bench tunnel's
    # time-sharing duty cycle (~25% inflation measured round 5). A short
    # profiler trace of the shipped step isolates the executable's true
    # DEVICE cost — on a directly-attached chip, wall ≈ device and THIS
    # is the number the host would measure. (DESIGN §6b; the round-5
    # trace decomposed it as fwd 2.76 + bwd 5.15 + opt 2.59 ms.)
    # BMT_BENCH_DEVICE_TRACE=0 skips.
    if on_tpu and os.environ.get('BMT_BENCH_DEVICE_TRACE', '1') != '0' \
            and 'xla' in train_fns:
        try:
            _stage('train device-time trace')
            import shutil
            import tempfile
            from bmt_tpu.utils.profiling import (trace,
                                                 trace_device_ms_per_exec)
            tdir = tempfile.mkdtemp(prefix='bmt_bench_trace_')
            try:
                fn = train_fns['xla'][0]
                NT = 3
                with trace(tdir):
                    out = None
                    for _ in range(NT):
                        out = fn()
                    np.asarray(out)
                dev_ms = trace_device_ms_per_exec(tdir, NT)
                _RESULT['train_device_step_ms'] = round(dev_ms, 3)
                if train_flops:
                    _RESULT['train_mfu_device'] = round(
                        train_flops / (dev_ms / 1e3) / PEAK_FLOPS, 4)
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
        except Exception as e:
            print(f'device trace failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # ---- proposal-generator train step (stage 2) --------------------------
    # Flagship prop shapes: B=16, padded 800 audio / 300 video rows, all 20
    # conv heads (reference: scripts/train_proposal_generator.py defaults).
    # BMT_BENCH_PROP=0 skips; the smoke test shrinks via BMT_BENCH_P* env.
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
                                                 compute_dtype=bf16),
                            donate_argnums=(0,))
            pcell = [init_train_state(pparams, popt, prng_impl='rbg')]
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
                pcost = pstep.lower(pcell[0], pbatch).compile() \
                    .cost_analysis()
                if isinstance(pcost, (list, tuple)):
                    pcost = pcost[0]
                prop_flops = float(pcost.get('flops', 0.0)) or None
            except Exception:
                pass

            def prop_once():
                new_state, m = pstep(pcell[0], pbatch)
                pcell[0] = new_state
                return m['loss']
            _warmup(prop_once)
            _warmup(prop_once)
            samples = [_time_once(prop_once, max(ITERS // 2, 1))
                       for _ in range(min(REPS, 3))]
            pbest, pp50 = _stats(samples)
            _RESULT.update({
                'prop_train_step_ms': round(pbest * 1e3, 3),
                'prop_train_step_ms_p50': round(pp50 * 1e3, 3),
                'prop_train_videos_per_sec': round(PB / pbest, 2),
            })
            if prop_flops:
                _RESULT['prop_train_mfu'] = round(
                    prop_flops / pbest / PEAK_FLOPS, 4)
        except Exception as e:
            print(f'prop train bench failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # ---- serving throughput (CaptionEngine, host-upload path) -------------
    # Beyond-reference subsystem (the reference has no serving): ragged
    # host crops -> validate/pad/bucket -> device upload -> batched greedy
    # decode -> detokenize. This is the END-TO-END number a serving user
    # sees, including the host work and the upload over the tunnel (which
    # bounds it here; on a directly-attached chip the upload shrinks ~10x).
    # BMT_BENCH_SERVE=0 skips.
    if os.environ.get('BMT_BENCH_SERVE', '1') != '0':
        _stage('serving throughput')
        try:
            from bmt_tpu.serve import CaptionEngine
            vocab = {'<blank>': 1, '<s>': 2, '</s>': 3,
                     **{f'w{i}': i for i in range(4, VOC)}}
            engine = CaptionEngine(params, dims, vocab, max_len=MAX_LEN,
                                   max_batch=B, compute_dtype=bf16)
            crops = []
            crng = np.random.default_rng(1)
            for i in range(B):
                sv = int(crng.integers(Sv // 2, Sv + 1))
                sa = int(crng.integers(Sa // 2, Sa + 1))
                crops.append({
                    'rgb': crng.normal(size=(sv, 1024)).astype(np.float32),
                    'flow': crng.normal(size=(sv, 1024)).astype(np.float32),
                    'audio': crng.normal(size=(sa, 128)).astype(np.float32),
                })

            def serve_once():
                return np.asarray(engine.caption_tokens(crops)[0])
            _warmup(serve_once)
            _warmup(serve_once)
            samples = [_time_once(serve_once, max(ITERS // 2, 1))
                       for _ in range(min(REPS, 3))]
            sbest, sp50 = _stats(samples)
            _RESULT.update({
                'serving_caps_per_sec': round(B / sbest, 2),
                'serving_caps_per_sec_p50': round(B / sp50, 2),
            })
        except Exception as e:
            print(f'serving bench failed: {type(e).__name__}: {e}',
                  file=sys.stderr)

    # ---- regression floors ------------------------------------------------
    # The guard stages above RECORD; this makes them GUARD: any headline
    # ratio below its floor lands in a non-empty `warnings` field (and on
    # stderr), so a silent kernel/decode regression cannot ship in a
    # clean-looking scoreboard. Floors are p50-based (spread-robust) and
    # deliberately below the measured round-4 values (4096: 2.71 measured,
    # floor 2.0; 2048: 1.22 measured, floor 1.0; decode vs_baseline: 13.1
    # measured, north-star floor 10).
    floors = {
        'vs_baseline_p50': 10.0,
        'attn_pallas_speedup_s4096': 2.0,
        'attn_pallas_speedup_s2048': 1.0,
        # trace-measured device MFU (round 5: 0.467, reproducible to
        # ~0.3% — tunnel weather does not touch it); a drop below 0.40
        # means the EXECUTABLE regressed, not the window
        'train_mfu_device': 0.40,
    }
    warns = [f'{k}={_RESULT[k]} below floor {floor}'
             for k, floor in floors.items()
             if _RESULT.get(k) is not None and _RESULT[k] < floor]
    for w in warns:
        print(f'bench REGRESSION: {w}', file=sys.stderr)
    _RESULT['warnings'] = warns

    _RESULT.pop('partial', None)
    _DONE.set()   # full run: the watchdog must not also print
    print(json.dumps(_RESULT))


if __name__ == '__main__':
    main()
