'''Production serving for the captioning model.

The reference has no serving story: its only inference surface is a
one-shot CLI (reference: sample/single_video_prediction.py:279-316) that
re-loads the model per invocation and decodes segments one by one. This
module turns the KV-cached batched decoder into a deployable service:

- ``CaptionEngine``   — shape-bucketed batched greedy decode with ahead-of-
                        time warmup: every (batch, Sv, Sa) bucket is
                        compiled once, then every request hits a cached
                        executable (no recompiles in steady state).
- ``MicroBatcher``    — coalesces concurrent single-segment requests into
                        device batches (latency-bounded micro-batching),
                        the standard recipe for high TPU utilization under
                        many small requests.
- ``CaptionHTTPServer`` — stdlib ThreadingHTTPServer JSON API
                        (POST /caption, GET /healthz, GET /stats).
- ``export_decode`` / ``load_exported_decode`` — `jax.export` serialization
  of the jitted decode for a fixed shape: a deployment artifact that runs
  without the model-building Python on the serving host.

Design notes. The decoder is already a single jitted ``lax.while_loop``
(decode/greedy.py) so a request costs one dispatch; the engine only has to
guarantee static shapes (bucket menus shared with the training data
pipeline) and batch admission. Per-row independence of the decode (pad
rows/keys are masked) makes batch padding semantically free.
'''
from __future__ import annotations

import json
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from bmt_tpu.data.captioning import (AUDIO_BUCKETS, VIDEO_BUCKETS,
                                     bucket_len)
from bmt_tpu.data.features import pad_stack_batch
from bmt_tpu.decode import greedy_decode_bimodal
from bmt_tpu.train.loops import ints_to_sentence

BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


class QueueFull(RuntimeError):
    '''Raised by MicroBatcher.submit when the admission queue is at
    capacity; the HTTP layer maps it to 503.'''


class DeadlineExceeded(RuntimeError):
    '''Raised into a request's Future when it aged past the batcher's
    ``deadline_ms`` before reaching the device (deadline-aware load
    shedding); the HTTP layer maps it to 504. Shedding at drain time
    bounds tail latency by POLICY — p99 <= deadline + one decode —
    instead of by queue growth.'''


class CaptionEngine:
    '''Batched, bucket-compiled greedy captioning over feature crops.

    ``caption_crops`` takes a list of per-segment feature dicts
    ({'rgb','flow','audio'}: (s, D) float arrays, ragged lengths), pads them
    to bucket shapes and returns one sentence per crop.
    '''

    def __init__(self, params, dims, vocab, *, max_len: int = 30,
                 start_token: str = '<s>', end_token: str = '</s>',
                 pad_token: str = '<blank>', max_batch: int = 64,
                 attention_impl: str = 'xla', kv_int8: bool = False,
                 weights_int8: bool = False, compute_dtype=None, dp=None,
                 decode_fn=None):
        '''``dp``: a ``bmt_tpu.parallel.DataParallel`` to shard decode
        batches across chips (params replicated, batch split over the dp
        axis — the same recipe the validation loops use). Batch buckets
        are rounded up to a dp-divisible size so every batch shards
        (requires ``max_batch`` divisible by the dp size).

        ``decode_fn``: optional fn(params, stacks) -> (B, max_len+1)
        tokens replacing the default greedy decoder — bind
        ``decode.make_bimodal_beam_fn`` / ``make_bimodal_sample_fn`` here
        to serve beam-searched or sampled captions.'''
        self.dims = dims
        self.vocab = vocab
        self.max_len = max_len
        self.end_token = end_token
        self.start_idx = vocab[start_token]
        self.end_idx = vocab[end_token]
        self.pad_idx = vocab[pad_token]
        self.max_batch = max_batch
        self.attention_impl = attention_impl
        self.kv_int8 = kv_int8
        if compute_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x,
                params)
        if weights_int8:
            # after the compute_dtype cast (scales/accumulators stay f32
            # inside qlinear regardless) and BEFORE dp replication, so the
            # mesh holds the int8 tree — half the replicated weight HBM
            from bmt_tpu.ops.quant import quantize_tree_int8
            params = quantize_tree_int8(params)
        self.weights_int8 = weights_int8
        self.decode_fn = decode_fn
        self.dp = dp if (dp is not None and dp.n_dp > 1) else None
        if self.dp is not None:
            if max_batch % self.dp.n_dp != 0:
                raise ValueError(
                    f'max_batch ({max_batch}) must divide evenly by '
                    f'dp_devices ({self.dp.n_dp}) so every bucket shards')
            params = self.dp.replicate_tree(params)
        self.params = params
        self.compute_dtype = compute_dtype
        # multi-tenant LoRA: adapter name -> params tree whose base leaves
        # ARE self.params' arrays (shared HBM) plus that adapter's deltas
        self.adapters: Dict[str, dict] = {}
        self._lock = threading.Lock()  # device dispatch is serialized
        # counters (read by /stats)
        self.n_requests = 0
        self.n_batches = 0
        self.n_rows_padded = 0

    # -- shape plumbing ---------------------------------------------------

    def _bucket_batch(self, n: int) -> int:
        b = self.max_batch
        for cand in BATCH_BUCKETS:
            if cand >= n:
                b = min(cand, self.max_batch)
                break
        if self.dp is not None:
            # round up to a dp-multiple so EVERY batch shards (params live
            # on the mesh; an unsharded batch would be redundantly decoded
            # in full on every chip). Works for non-power-of-two meshes
            # too: max_batch is dp-divisible (checked at init), so the
            # clamp preserves divisibility.
            nd = self.dp.n_dp
            b = min(-(-b // nd) * nd, self.max_batch)
        return b

    def _pad_batch(self, crops: Sequence[dict], Bb: int, Sv: int, Sa: int):
        rgb = pad_stack_batch([c['rgb'] for c in crops], self.pad_idx, Sv)
        flow = pad_stack_batch([c['flow'] for c in crops], 0.0, Sv)
        audio = pad_stack_batch([c['audio'] for c in crops], self.pad_idx,
                                Sa)
        if len(crops) < Bb:
            # repeat row 0 so pad rows decode over real masks; results are
            # sliced away. (An all-pad audio row would decode fine too, but
            # keeping rows real avoids the all-masked softmax edge case.)
            def fill(x):
                reps = np.repeat(x[:1], Bb - x.shape[0], axis=0)
                return np.concatenate([x, reps], axis=0)
            rgb, flow, audio = fill(rgb), fill(flow), fill(audio)
        # stay NUMPY here: placement happens once in caption_tokens (plain
        # device upload, or dp.shard — which would otherwise pull an
        # already-uploaded batch back to host before re-uploading sharded)
        dt = self.compute_dtype or jnp.float32
        return {'rgb': rgb.astype(dt), 'flow': flow.astype(dt),
                'audio': audio.astype(dt)}

    # -- multi-tenant LoRA ------------------------------------------------

    def add_adapter(self, name: str, sites: Dict[str, dict]) -> int:
        '''Register a LoRA adapter under ``name`` for per-request selection
        (``caption_crops(..., adapter=name)``, HTTP ``{"adapter": name}``).

        ``sites``: ``{tree_path: {'lora_a','lora_b','lora_s'}}`` from
        ``bmt_tpu.train.checkpoint.load_lora_sites``. The adapter tree
        SHARES the engine's base arrays — N domains cost one frozen base
        in HBM plus each finetune's kilobyte deltas — and is applied
        inside ``ops/layers.py:linear`` (composes with ``weights_int8``:
        the delta rides on top of the quantized base matmul). All
        same-rank adapters also share one compiled decode executable
        (identical treedef + shapes). Returns the adapted-site count.'''
        def place(x):
            arr = jnp.asarray(x, jnp.float32)
            return (self.dp.replicate_tree(arr) if self.dp is not None
                    else arr)

        def graft(node, segs, leaves, path_done):
            if not segs:
                if not isinstance(node, dict) or \
                        not ({'w', 'w_q'} & set(node)):
                    raise ValueError(
                        f'adapter {name!r}: site {path_done!r} is not a '
                        f'linear in the served model')
                w = node.get('w', node.get('w_q'))
                a, b = leaves['lora_a'], leaves['lora_b']
                if (a.shape[0], b.shape[1]) != tuple(w.shape) or \
                        a.shape[1] != b.shape[0]:
                    raise ValueError(
                        f'adapter {name!r}: site {path_done!r} deltas '
                        f'{a.shape}x{b.shape} do not fit the base '
                        f'{tuple(w.shape)} linear')
                return {**node,
                        'lora_a': place(a), 'lora_b': place(b),
                        'lora_s': place(leaves['lora_s'])}
            head, rest = segs[0], segs[1:]
            if isinstance(node, (list, tuple)):
                i = int(head)
                if not 0 <= i < len(node):
                    raise ValueError(
                        f'adapter {name!r}: site path {path_done}/{head} '
                        f'indexes past the served model\'s {len(node)} '
                        f'layers (finetune of a deeper architecture?)')
                return type(node)(
                    graft(v, rest, leaves, f'{path_done}/{head}')
                    if j == i else v for j, v in enumerate(node))
            if not isinstance(node, dict) or head not in node:
                raise ValueError(
                    f'adapter {name!r}: site path {path_done}/{head} not '
                    f'in the served model (different architecture?)')
            return {**node, head: graft(node[head], rest, leaves,
                                        f'{path_done}/{head}')}

        tree = self.params
        for site, leaves in sites.items():
            tree = graft(tree, site.split('/'), leaves, '')
        self.adapters[name] = tree
        return len(sites)

    def _select_params(self, adapter: Optional[str]):
        if adapter is None:
            return self.params
        if adapter not in self.adapters:
            raise ValueError(
                f'unknown adapter {adapter!r}; loaded: '
                f'{sorted(self.adapters) or "none"}')
        return self.adapters[adapter]

    # -- public API -------------------------------------------------------

    def validate_crop(self, crop: dict) -> None:
        '''Per-request shape/length validation — raised at ADMISSION (the
        MicroBatcher and the HTTP parser both call it), so one bad crop
        400s alone instead of poisoning a coalesced batch.'''
        if crop['rgb'].shape[0] != crop['flow'].shape[0]:
            # I3D emits rgb/flow in lockstep; a length mismatch means
            # corrupted inputs, and a longer flow would otherwise be
            # silently truncated to the rgb-derived bucket
            raise ValueError(
                f'rgb/flow length mismatch: {crop["rgb"].shape[0]} vs '
                f'{crop["flow"].shape[0]} frames (I3D emits both streams '
                f'at the same temporal stride)')
        if crop['rgb'].shape[0] > VIDEO_BUCKETS[-1] \
                or crop['audio'].shape[0] > AUDIO_BUCKETS[-1]:
            raise ValueError(
                f'crop too long: video {crop["rgb"].shape[0]} frames '
                f'(max {VIDEO_BUCKETS[-1]}), audio '
                f'{crop["audio"].shape[0]} (max {AUDIO_BUCKETS[-1]}) — '
                f'split the segment')

    def caption_tokens(self, crops: Sequence[dict],
                       _count: bool = True,
                       adapter: Optional[str] = None) -> np.ndarray:
        '''Decode a list of crops; returns (len(crops), max_len+1) int32.
        Crops longer than the largest sequence bucket are rejected (the
        bucket pad would silently truncate them). ``adapter`` selects a
        registered LoRA adapter (add_adapter); None decodes the base.'''
        params = self._select_params(adapter)
        if not crops:
            return np.zeros((0, self.max_len + 1), np.int32)
        for c in crops:
            self.validate_crop(c)
        out = []
        for lo in range(0, len(crops), self.max_batch):
            chunk = crops[lo:lo + self.max_batch]
            Bb = self._bucket_batch(len(chunk))
            Sv = bucket_len(max(c['rgb'].shape[0] for c in chunk),
                            VIDEO_BUCKETS)
            Sa = bucket_len(max(c['audio'].shape[0] for c in chunk),
                            AUDIO_BUCKETS)
            batch = self._pad_batch(chunk, Bb, Sv, Sa)
            if self.dp is not None:
                batch = self.dp.shard(batch)   # Bb always divides n_dp
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            with self._lock:
                if self.decode_fn is not None:
                    toks = self.decode_fn(params, batch)
                else:
                    toks = greedy_decode_bimodal(
                        params, self.dims, batch, self.max_len,
                        self.start_idx, self.end_idx, self.pad_idx,
                        attention_impl=self.attention_impl,
                        kv_int8=self.kv_int8)
                toks = np.asarray(toks)[:len(chunk)]
                if _count:
                    self.n_batches += 1
                    self.n_requests += len(chunk)
                    self.n_rows_padded += Bb - len(chunk)
            out.append(toks)
        return np.concatenate(out, axis=0)

    def caption_crops(self, crops: Sequence[dict],
                      adapter: Optional[str] = None) -> List[str]:
        toks = self.caption_tokens(crops, adapter=adapter)
        return [ints_to_sentence(row, self.vocab, self.end_token)
                for row in toks]

    def warmup(self, batch_sizes: Sequence[int] = None,
               shapes: Sequence[tuple] = ((96, 256),)) -> int:
        '''Compile the (batch, Sv, Sa) grid ahead of traffic. ``shapes`` is
        (Sv, Sa) pairs — the real val_1 menu collapses to ~5 of them
        (docs/DESIGN.md §2). ``batch_sizes`` defaults to EVERY batch bucket
        up to max_batch, so a warmed server never compiles in steady state.
        Warmup decodes bypass the /stats counters. Returns the number of
        executables compiled.

        Registered adapters (add_adapter) are warmed too — their trees
        carry extra lora leaves, a different treedef, hence a different
        executable — one representative per distinct adapter tree
        signature (same-rank adapters share one compiled decode), so the
        first `{"adapter": name}` request never compiles either.'''
        if batch_sizes is None:
            # the REACHABLE bucket set: every power-of-two request size
            # mapped through _bucket_batch (which applies the dp rounding
            # and the max_batch clamp), plus max_batch itself — so a
            # warmed server never compiles in steady state even for
            # non-bucket max_batch values
            batch_sizes = sorted(
                {self._bucket_batch(b)
                 for b in BATCH_BUCKETS if b <= self.max_batch}
                | {self.max_batch})
        # one representative adapter per distinct tree signature
        # (treedef + leaf shapes): same-signature adapters hit the same
        # jit cache entry, so warming one warms them all
        adapter_reps, seen_sigs = [], set()
        for a_name, tree in sorted(self.adapters.items()):
            sig = (jax.tree_util.tree_structure(tree),
                   tuple(x.shape for x in jax.tree.leaves(tree)))
            if sig not in seen_sigs:
                seen_sigs.add(sig)
                adapter_reps.append(a_name)
        n = 0
        for Sv, Sa in shapes:
            for b in batch_sizes:
                if b > self.max_batch:
                    continue
                crop = {'rgb': np.zeros((Sv, self.dims.d_vid), np.float32),
                        'flow': np.zeros((Sv, self.dims.d_vid), np.float32),
                        'audio': np.zeros((Sa, self.dims.d_aud), np.float32)}
                for a_name in [None] + adapter_reps:
                    self.caption_tokens([crop] * b, _count=False,
                                        adapter=a_name)
                    n += 1
        return n

    def stats(self) -> dict:
        return {'requests': self.n_requests, 'batches': self.n_batches,
                'rows_padded': self.n_rows_padded,
                'avg_batch': round(self.n_requests / self.n_batches, 2)
                if self.n_batches else 0.0,
                'adapters': sorted(self.adapters)}


class MicroBatcher:
    '''Coalesce concurrent caption requests into engine batches.

    ``submit(crop)`` returns a Future resolving to the sentence. A worker
    thread drains the queue: it waits at most ``max_wait_ms`` after the
    first pending request (latency bound), then decodes everything pending
    up to ``engine.max_batch`` in one device batch (throughput bound).
    '''

    def __init__(self, engine: CaptionEngine, max_wait_ms: float = 5.0,
                 max_queue: int = 1024,
                 deadline_ms: Optional[float] = None):
        '''``max_queue`` bounds the admission queue: past it, submit()
        raises QueueFull (HTTP maps it to 503) instead of buffering
        unboundedly while the device falls behind — load sheds at the
        edge, where the client can retry against a replica.

        ``deadline_ms`` bounds each request's QUEUE age: at every drain,
        requests older than the deadline fail with DeadlineExceeded (HTTP
        504) instead of being decoded. Together they bound the tail by
        policy: a request either reaches the device within
        ``deadline_ms`` or is shed, so p99 <= deadline + one decode
        regardless of overload depth. None (default) keeps the
        queue-cap-only behavior.'''
        self.engine = engine
        self.max_wait = max_wait_ms / 1e3
        self.max_queue = max_queue
        self.deadline = deadline_ms / 1e3 if deadline_ms else None
        self.n_shed = 0
        self._pending: List[tuple] = []
        self._mu = threading.Condition()
        self._closed = False
        # end-to-end latency samples (submit -> result), bounded window
        from collections import deque
        self._lat = deque(maxlen=2048)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, crop: dict,
               adapter: Optional[str] = None) -> 'Future[str]':
        # validate at ADMISSION: a bad crop (or unknown adapter) must fail
        # its own submit() call, not the whole coalesced batch it would
        # have joined
        self.engine.validate_crop(crop)
        self.engine._select_params(adapter)
        fut: Future = Future()
        with self._mu:
            if self._closed:
                raise RuntimeError('batcher is closed')
            if len(self._pending) >= self.max_queue:
                raise QueueFull(
                    f'{len(self._pending)} requests already queued')
            self._pending.append((crop, fut, time.monotonic(), adapter))
            self._mu.notify()
        return fut

    def caption(self, crop: dict, timeout: Optional[float] = None,
                adapter: Optional[str] = None) -> str:
        return self.submit(crop, adapter=adapter).result(timeout)

    def _run(self):
        while True:
            with self._mu:
                while not self._pending and not self._closed:
                    self._mu.wait()
                if self._closed and not self._pending:
                    return
                deadline = time.monotonic() + self.max_wait
                while (len(self._pending) < self.engine.max_batch
                       and not self._closed):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._mu.wait(timeout=left)
                # drop requests whose clients already gave up (cancelled
                # futures): overload must not amplify into wasted device
                # work on answers nobody is waiting for
                self._pending = [e for e in self._pending
                                 if not e[1].cancelled()]
                # deadline-aware shedding: fail requests that aged past
                # deadline_ms in the queue — they would otherwise blow
                # the tail for themselves AND delay everything behind
                # them by a decode they no longer have time for
                if self.deadline is not None:
                    now = time.monotonic()
                    live, dead = [], []
                    for e in self._pending:
                        (dead if now - e[2] > self.deadline
                         else live).append(e)
                    self._pending = live
                    self.n_shed += len(dead)
                    for _, fut, t0, _ in dead:
                        if not fut.done():
                            fut.set_exception(DeadlineExceeded(
                                f'queued {(now - t0) * 1e3:.0f} ms > '
                                f'deadline {self.deadline * 1e3:.0f} ms; '
                                f'retry against a replica'))
                # admit at most one device batch. A batch decodes with ONE
                # adapter (params are a single tree per dispatch), so take
                # the OLDEST request's adapter and coalesce only its
                # cohort — oldest-first keeps every adapter's queue
                # draining (no starvation), and single-adapter traffic
                # batches exactly as before.
                take = self.engine.max_batch
                if self._pending:
                    adapter = self._pending[0][3]
                    batch, rest = [], []
                    for e in self._pending:
                        if e[3] == adapter and len(batch) < take:
                            batch.append(e)
                        else:
                            rest.append(e)
                    self._pending = rest
                else:
                    batch, adapter = [], None
            if not batch:
                continue
            crops = [c for c, _, _, _ in batch]
            try:
                sentences = self.engine.caption_crops(crops,
                                                      adapter=adapter)
                done_t = time.monotonic()
                for (_, fut, t0, _), s in zip(batch, sentences):
                    # a future cancelled mid-decode must not poison its
                    # batchmates (set_result on it raises
                    # InvalidStateError); races between the check and the
                    # set are absorbed per-future
                    try:
                        if not fut.cancelled():
                            fut.set_result(s)
                            self._lat.append(done_t - t0)
                    except Exception:
                        pass
            except Exception as e:  # propagate to every waiter
                for _, fut, _, _ in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def stats(self) -> dict:
        '''Operational metrics: live queue depth and end-to-end latency
        percentiles (submit -> result, ms) over a rolling 2048-sample
        window — the numbers an operator alerts on.'''
        with self._mu:
            depth = len(self._pending)
        lats = sorted(self._lat)

        def pct(p):
            if not lats:
                return None
            return round(lats[min(int(p * len(lats)), len(lats) - 1)] * 1e3,
                         2)

        return {'queue_depth': depth,
                'latency_ms': {'p50': pct(0.50), 'p95': pct(0.95),
                               'p99': pct(0.99)},
                'latency_samples': len(lats),
                'shed': self.n_shed}

    def close(self):
        with self._mu:
            self._closed = True
            self._mu.notify_all()
        self._worker.join()


class VideoPipeline:
    '''The full dense-captioning pipeline as a service: full-video features
    -> proposal generator -> per-segment crops -> caption engine. This is
    the sample app (reference: single_video_prediction.py:279-316) recast
    for serving: the proposal forward is jitted once at the fixed padded
    shapes and segment captioning rides the shared micro-batching engine.
    '''

    def __init__(self, engine: CaptionEngine, prop_params, prop_dims,
                 prop_cfg, nms_tiou: Optional[float] = None):
        import jax as _jax
        from bmt_tpu.models import multimodal_proposal_forward
        from bmt_tpu.ops.masks import make_masks as _make_masks
        self.engine = engine
        self.prop_params = prop_params
        self.pad_feats = prop_cfg.pad_feats_up_to   # {'audio': S, 'video': S}
        self.max_props = prop_cfg.max_prop_per_vid
        self.modality = prop_cfg.modality
        self.nms_tiou = nms_tiou
        self._make_masks = _make_masks
        self._fwd = _jax.jit(
            lambda p, s, m: multimodal_proposal_forward(
                p, prop_dims, s, None, m, deterministic=True)[0])

    def predict(self, feats: Dict[str, np.ndarray], duration: float,
                nms_tiou: Optional[float] = None,
                adapter: Optional[str] = None) -> List[dict]:
        '''feats: full-video {'rgb','flow','audio'} (s, D) arrays; returns
        [{'start', 'end', 'sentence'}, ...] sorted by confidence.
        ``adapter`` selects a registered LoRA finetune for the CAPTIONING
        half (proposals always use the base proposal generator).'''
        self.engine._select_params(adapter)   # reject unknown names early
        from bmt_tpu.data.features import crop_a_segment, pad_segment
        from bmt_tpu.utils.proposal_utils import (
            get_corner_coords, non_max_suppression,
            remove_very_short_segments, select_topk_predictions,
            trim_proposals)

        pad_idx = self.engine.pad_idx
        stacks = {
            'audio': jnp.asarray(pad_segment(
                feats['audio'], self.pad_feats['audio'], pad_idx)[None]),
            'rgb': jnp.asarray(pad_segment(
                feats['rgb'], self.pad_feats['video'], pad_idx)[None]),
            'flow': jnp.asarray(pad_segment(
                feats['flow'], self.pad_feats['video'], 0.0)[None]),
        }
        masks = self._make_masks(stacks, None, self.modality, pad_idx)
        with self.engine._lock:
            preds = np.asarray(self._fwd(self.prop_params, stacks, masks))
        preds = get_corner_coords(preds)
        preds = trim_proposals(preds, [duration])
        preds = remove_very_short_segments(preds, 0.2)
        preds = select_topk_predictions(preds, k=self.max_props)
        tiou = nms_tiou if nms_tiou is not None else self.nms_tiou
        segments = preds.reshape(-1, 3)
        if tiou is not None:
            segments = non_max_suppression(segments, tiou)

        crops, kept = [], []
        for start, end, conf in segments:
            crop = {k: crop_a_segment(feats[k], float(start), float(end),
                                      duration) for k in feats}
            if any(v is None for v in crop.values()):
                continue   # degenerate zero-length crop (reference skips)
            crops.append(crop)
            kept.append((float(start), float(end)))
        sentences = self.engine.caption_crops(crops, adapter=adapter)
        return [{'start': round(s, 1), 'end': round(e, 1), 'sentence': sent}
                for (s, e), sent in zip(kept, sentences)]


# -- HTTP front-end -------------------------------------------------------


def _crop_from_json(obj: dict, dims, max_lens=None) -> dict:
    '''Parse and validate one request's features. ``max_lens``
    {'video': n, 'audio': n} rejects over-length inputs per request (a
    bad crop must 400 at admission, not poison a coalesced batch).'''
    if max_lens is None:
        max_lens = {'video': VIDEO_BUCKETS[-1], 'audio': AUDIO_BUCKETS[-1]}
    feats = obj.get('features', obj)
    crop = {}
    for key, d, kind in (('rgb', dims.d_vid, 'video'),
                         ('flow', dims.d_vid, 'video'),
                         ('audio', dims.d_aud, 'audio')):
        if key not in feats:
            raise ValueError(f'missing feature: {key}')
        arr = np.asarray(feats[key], np.float32)
        if arr.ndim != 2 or arr.shape[1] != d:
            raise ValueError(
                f'{key}: expected (s, {d}), got {list(arr.shape)}')
        if arr.shape[0] > max_lens[kind]:
            raise ValueError(
                f'{key}: {arr.shape[0]} frames exceeds the maximum '
                f'{max_lens[kind]} — split the segment')
        crop[key] = arr
    if crop['rgb'].shape[0] != crop['flow'].shape[0]:
        raise ValueError(
            f'rgb/flow length mismatch: {crop["rgb"].shape[0]} vs '
            f'{crop["flow"].shape[0]} frames (I3D emits both streams at '
            f'the same temporal stride)')
    return crop


class _CaptionHandler(BaseHTTPRequestHandler):
    # instantiated per request by ThreadingHTTPServer; the server object
    # carries the batcher/engine
    def _reply(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header('Content-Type', 'application/json')
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == '/healthz':
            self._reply(200, {'status': 'ok'})
        elif self.path == '/stats':
            stats = dict(self.server.engine.stats())
            stats.update(self.server.batcher.stats())
            self._reply(200, stats)
        else:
            self._reply(404, {'error': f'unknown path {self.path}'})

    def do_POST(self):
        if self.path == '/caption':
            handler, payload_key = self._handle_caption, 'sentence'
        elif self.path == '/predict':
            if self.server.pipeline is None:
                self._reply(404, {'error': 'no proposal model loaded '
                                           '(--prop_generator_model_path)'})
                return
            handler, payload_key = self._handle_predict, 'results'
        else:
            self._reply(404, {'error': f'unknown path {self.path}'})
            return
        try:
            length = int(self.headers.get('Content-Length', 0))
            obj = json.loads(self.rfile.read(length))
            if not isinstance(obj, dict):
                raise ValueError('request body must be a JSON object')
        except Exception as e:
            self._reply(400, {'error': f'{type(e).__name__}: {e}'})
            return
        try:
            result = handler(obj)
        except QueueFull as e:
            self._reply(503, {'error': f'server saturated: {e}'})
            return
        except FutureTimeoutError:
            # overload: tell the client to retry (504, not a generic 500)
            self._reply(504, {'error': 'request timed out in queue; '
                                       'retry against a replica'})
            return
        except DeadlineExceeded as e:
            # deadline-shed by the batcher (policy-bounded tail): same
            # retry semantics as a queue timeout
            self._reply(504, {'error': str(e)})
            return
        except (ValueError, KeyError, TypeError) as e:
            # anything raised while interpreting client values is a client
            # error (wrong nesting, ragged rows, non-numeric, missing keys)
            self._reply(400, {'error': f'{type(e).__name__}: {e}'})
            return
        except Exception as e:
            self._reply(500, {'error': f'{type(e).__name__}: {e}'})
            return
        self._reply(200, {payload_key: result})

    def _handle_caption(self, obj: dict):
        crop = _crop_from_json(obj, self.server.engine.dims)
        adapter = obj.get('adapter')
        if adapter is not None and not isinstance(adapter, str):
            raise ValueError('"adapter" must be a string adapter name')
        fut = self.server.batcher.submit(crop, adapter=adapter)
        try:
            return fut.result(timeout=self.server.request_timeout)
        except FutureTimeoutError:
            # the client is gone: cancel so an undispatched crop is
            # dropped at the next drain instead of wasting device work
            fut.cancel()
            raise

    def _handle_predict(self, obj: dict):
        # full-video features must fit the proposal model's fixed padded
        # lengths (pad_segment would assert -> 500 otherwise)
        feats = _crop_from_json(obj, self.server.engine.dims,
                                max_lens=self.server.pipeline.pad_feats)
        duration = float(obj['duration'])
        if duration <= 0:
            raise ValueError('duration must be positive')
        nms = obj.get('nms_tiou')
        adapter = obj.get('adapter')
        if adapter is not None and not isinstance(adapter, str):
            raise ValueError('"adapter" must be a string adapter name')
        return self.server.pipeline.predict(
            feats, duration, None if nms is None else float(nms),
            adapter=adapter)

    def log_message(self, *args):  # quiet by default
        pass


class CaptionHTTPServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, engine: CaptionEngine,
                 max_wait_ms: float = 5.0, request_timeout: float = 120.0,
                 pipeline: Optional[VideoPipeline] = None,
                 max_queue: int = 1024,
                 deadline_ms: Optional[float] = None):
        super().__init__(addr, _CaptionHandler)
        self.engine = engine
        self.batcher = MicroBatcher(engine, max_wait_ms,
                                    max_queue=max_queue,
                                    deadline_ms=deadline_ms)
        self.request_timeout = request_timeout
        self.pipeline = pipeline

    def shutdown(self):
        super().shutdown()
        self.batcher.close()
        self.server_close()  # release the listening socket


# -- AOT export -----------------------------------------------------------


def export_decode(params, dims, batch: int, Sv: int, Sa: int,
                  max_len: int = 30, start_idx: int = 2, end_idx: int = 3,
                  pad_idx: int = 1, attention_impl: str = 'xla',
                  kv_int8: bool = False) -> bytes:
    '''Serialize the jitted greedy decode for one fixed shape via
    ``jax.export``. The blob replays on any host with a compatible jax —
    no bmt_tpu model code needed at serving time. Weights stay an input
    (same pytree structure), so one artifact serves every checkpoint of an
    architecture.'''
    from jax import export as jax_export

    def fn(params, stacks):
        return greedy_decode_bimodal(params, dims, stacks, max_len,
                                     start_idx, end_idx, pad_idx,
                                     attention_impl, kv_int8)

    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params)
    # feature dtype follows the params' float dtype (not simply the first
    # leaf: a weights_int8 tree's first leaf may be an int8 weight)
    dt = next(x.dtype for x in jax.tree.leaves(params)
              if jnp.issubdtype(x.dtype, jnp.floating))
    s_spec = {'rgb': jax.ShapeDtypeStruct((batch, Sv, dims.d_vid), dt),
              'flow': jax.ShapeDtypeStruct((batch, Sv, dims.d_vid), dt),
              'audio': jax.ShapeDtypeStruct((batch, Sa, dims.d_aud), dt)}
    exported = jax_export.export(jax.jit(fn))(p_spec, s_spec)
    return bytes(exported.serialize())


def load_exported_decode(blob: bytes):
    '''Deserialize an ``export_decode`` artifact; returns
    fn(params, stacks) -> (B, max_len+1) tokens.'''
    from jax import export as jax_export
    exported = jax_export.deserialize(blob)
    return lambda params, stacks: exported.call(params, stacks)
