'''Captioning dataset: host-side batcher producing fixed-shape device feeds.

TPU re-design of the reference's torchtext pipeline (reference:
datasets/captioning_dataset.py): instead of a GPU-side BucketIterator with
per-batch dynamic padding, batches are padded to a small set of static bucket
lengths so XLA compiles a handful of shapes once, and a background prefetch
thread overlaps host IO with device compute.

Semantics preserved from the reference:
- vocab from train.csv with specials [<unk>, <blank>, <s>, </s>] -> pad=1,
- captions wrapped with <s>/<​s> and padded with pad_idx,
- rgb/audio feature padding value = pad_idx (~1.0), flow = 0.0
  (captioning_dataset.py:255-258 — rgb+flow are summed downstream),
- missing feature files -> zero (1, D) stacks,
- per-epoch reshuffle (seeded, deterministic).
'''
from __future__ import annotations

import os
import queue
import threading
from bisect import bisect_left
from typing import Iterator, List, Optional

import numpy as np

from bmt_tpu.data.native import batch_load, npy_shape
from bmt_tpu.data.tokenizer import tokenize_en
from bmt_tpu.data.vocab import Vocab, build_vocab_from_meta, read_meta_csv

# static pad buckets: few enough for a small compile count, tight enough to
# bound padding waste (sequence dims needn't be multiples of 128 — the model
# dims provide the MXU lane alignment)
VIDEO_BUCKETS = (16, 32, 64, 96, 128, 192, 256, 384, 512)
AUDIO_BUCKETS = (16, 32, 64, 128, 256, 384, 512, 640, 800, 1024, 1536)
CAPTION_BUCKETS = (16, 24, 32, 48, 64, 96, 128)


def bucket_len(n: int, buckets) -> int:
    i = bisect_left(buckets, n)
    return buckets[min(i, len(buckets) - 1)]


class CaptioningDataset:
    '''One instance per phase (train / val_1 / val_2 / learned_props).

    Replaces ActivityNetCaptionsDataset (reference:
    captioning_dataset.py:281-354). Vocabulary always comes from the train
    meta file regardless of phase.
    '''

    def __init__(self, cfg, phase: str, vocab: Optional[Vocab] = None):
        self.cfg = cfg
        self.phase = phase
        meta_by_phase = {
            'train': cfg.train_meta_path,
            'val_1': cfg.val_1_meta_path,
            'val_2': cfg.val_2_meta_path,
            'learned_props': getattr(cfg, 'val_prop_meta_path', None),
        }
        self.meta_path = meta_by_phase[phase]
        if self.meta_path is None:
            raise ValueError(f'no meta path for phase {phase}')
        from bmt_tpu.data.assets import ensure_meta_file
        ensure_meta_file(self.meta_path)
        self.rows = read_meta_csv(self.meta_path)

        self.batch_size = (cfg.train_batch_size if phase == 'train'
                           else cfg.inference_batch_size)

        if vocab is None:
            if getattr(cfg, 'vocab_path', None):
                vocab = Vocab.load(cfg.vocab_path)
            else:
                vocab = build_vocab_from_meta(
                    cfg.train_meta_path, cfg.start_token, cfg.end_token,
                    cfg.pad_token, cfg.min_freq_caps)
        self.train_vocab = vocab
        self.trg_voc_size = len(vocab)
        self.pad_idx = vocab[cfg.pad_token]
        self.start_idx = vocab[cfg.start_token]
        self.end_idx = vocab[cfg.end_token]

        # pre-tokenize all captions once (host-side, cached per dataset)
        self._encoded = [self._encode_caption(r['caption']) for r in self.rows]

    def _encode_caption(self, caption: str) -> List[int]:
        toks = [t.lower() for t in tokenize_en(caption)]
        return ([self.start_idx] + self.train_vocab.encode(toks)
                + [self.end_idx])

    def __len__(self):
        return (len(self.rows) + self.batch_size - 1) // self.batch_size

    def num_rows(self):
        return len(self.rows)

    # -- batch assembly ----------------------------------------------------

    def _npy_rows(self, path: str):
        '''Memoized npy header read (many caption rows share one video
        file; the sort-key pass touches every row).'''
        memo = self.__dict__.setdefault('_npy_rows_memo', {})
        if path not in memo:
            try:
                memo[path] = npy_shape(path)[0]
            except FileNotFoundError:
                memo[path] = None
        return memo[path]

    def _crop_len(self, path: str, row) -> int:
        '''Length of the proportional crop without loading data
        (reference crop rule: load_features.py:14-28).'''
        S = self._npy_rows(path)
        if S is None:
            return 1
        s = int(S * (row['start'] / row['duration']))
        e = int(S * (row['end'] / row['duration']))
        if s == e:
            return 1
        return max(min(e, S) - max(s, 0), 1)

    def make_batch(self, indices: List[int],
                   local_rows: Optional[tuple] = None) -> dict:
        '''Assemble one fixed-shape batch. The feature hot path goes through
        the native C++ loader (mmap + thread pool) when built.

        ``local_rows=(lo, hi)``: per-host sharded input pipeline — feature
        IO runs only for batch rows [lo, hi) (the rows this process's
        chips will actually receive under the dp sharding; see
        ``DataParallel.local_rows``). Other rows stay zero and are never
        transferred. Batch GEOMETRY (sequence buckets) is still computed
        over all rows from the memoized npy headers, so every host
        compiles and runs the same shapes.'''
        rows = [self.rows[i] for i in indices]
        captions = [self._encoded[i] for i in indices]

        Sc = bucket_len(max(len(c) for c in captions), CAPTION_BUCKETS)
        cap = np.full((len(rows), Sc), self.pad_idx, np.int32)
        for i, c in enumerate(captions):
            if len(c) > Sc:
                # caption exceeds the largest bucket: truncate but KEEP the
                # terminator so the training target still ends with </s>
                # (the reference pads dynamically and never truncates)
                c = list(c[:Sc - 1]) + [c[-1]]
            cap[i, :len(c)] = c

        starts = [r['start'] for r in rows]
        ends = [r['end'] for r in rows]
        durs = [r['duration'] for r in rows]
        full = [0] * len(rows)

        def _load(paths, pad, S, D):
            # feature IO restricted to this host's dp row block; non-local
            # rows stay zero (device_put never transfers them)
            if local_rows is None:
                return batch_load(paths, starts, ends, durs, full, pad, S,
                                  D)
            lo = max(local_rows[0], 0)
            hi = min(local_rows[1], len(paths))
            out = np.zeros((len(paths), S, D), np.float32)
            st = np.zeros((len(paths),), np.int32)
            if hi > lo:
                out[lo:hi], st[lo:hi] = batch_load(
                    paths[lo:hi], starts[lo:hi], ends[lo:hi], durs[lo:hi],
                    full[lo:hi], pad, S, D)
            return out, st

        src = {}
        if 'video' in self.cfg.modality:
            rgb_paths = [os.path.join(self.cfg.video_features_path,
                                      f"{r['video_id']}_rgb.npy")
                         for r in rows]
            flow_paths = [os.path.join(self.cfg.video_features_path,
                                       f"{r['video_id']}_flow.npy")
                          for r in rows]
            max_v = max(self._crop_len(p, r)
                        for p, r in zip(rgb_paths, rows))
            if max_v > VIDEO_BUCKETS[-1] and \
                    not getattr(self, '_warned_trunc_v', False):
                self._warned_trunc_v = True
                import sys as _sys
                print(f'WARNING: video crop of {max_v} frames exceeds the '
                      f'largest bucket ({VIDEO_BUCKETS[-1]}) and will be '
                      f'truncated (the reference pads dynamically); extend '
                      f'VIDEO_BUCKETS if long segments matter',
                      file=_sys.stderr)
            Sv = bucket_len(max_v, VIDEO_BUCKETS)
            rgb, st_r = _load(rgb_paths, self.pad_idx, Sv, self.cfg.d_vid)
            flow, st_f = _load(flow_paths, 0.0, Sv, self.cfg.d_vid)
            # a video missing EITHER stream zero-fills BOTH, like the
            # reference (load_features.py loads rgb+flow in one try block
            # — a real rgb summed with an absent flow is a feature vector
            # the reference never produces)
            either = (st_r | st_f).astype(bool)
            # I3D emits rgb/flow in lockstep; a row-count mismatch means a
            # truncated/corrupt stream whose crop would pad zeros where
            # the sibling has real frames — the summed rgb+flow would be
            # temporally garbled, so the pair zero-fills (the reference
            # asserts the equality, load_features.py:78)
            for _i, (_rp, _fp) in enumerate(zip(rgb_paths, flow_paths)):
                if (self._npy_rows(_rp) or 0) != (self._npy_rows(_fp) or 0):
                    either[_i] = True
            if either.any():
                rgb[either] = self.pad_idx
                rgb[either, 0] = 0.0
                flow[either] = 0.0
            src['rgb'], src['flow'] = rgb, flow
        if 'audio' in self.cfg.modality:
            aud_paths = [os.path.join(self.cfg.audio_features_path,
                                      f"{r['video_id']}.npy") for r in rows]
            max_a = max(self._crop_len(p, r)
                        for p, r in zip(aud_paths, rows))
            if max_a > AUDIO_BUCKETS[-1] and \
                    not getattr(self, '_warned_trunc_a', False):
                self._warned_trunc_a = True
                import sys as _sys
                print(f'WARNING: audio crop of {max_a} frames exceeds the '
                      f'largest bucket ({AUDIO_BUCKETS[-1]}) and will be '
                      f'truncated; extend AUDIO_BUCKETS if long segments '
                      f'matter', file=_sys.stderr)
            Sa = bucket_len(max_a, AUDIO_BUCKETS)
            src['audio'], _ = _load(aud_paths, self.pad_idx, Sa,
                                    self.cfg.d_aud)

        return {
            'src': src,
            'caption': cap,
            'video_ids': [r['video_id'] for r in rows],
            'starts': np.asarray(starts, np.float32),
            'ends': np.asarray(ends, np.float32),
        }

    def _sort_lens(self) -> np.ndarray:
        '''Per-row crop length of the DOMINANT modality (video when
        present: d_vid=1024 makes Sv the FLOP driver; else audio), used
        as the within-window sort key. One pass through the SAME
        ``_crop_len`` rule the batch bucketer uses (memoized headers), so
        the sort key can never desynchronize from the batch geometry.'''
        if getattr(self, '_sort_lens_cache', None) is None:
            if 'video' in self.cfg.modality:
                base, suffix = self.cfg.video_features_path, '_rgb.npy'
            else:
                base, suffix = self.cfg.audio_features_path, '.npy'
            self._sort_lens_cache = np.asarray([
                self._crop_len(
                    os.path.join(base, f"{r['video_id']}{suffix}"), r)
                for r in self.rows], np.int32)
        return self._sort_lens_cache

    def batches(self, epoch: int = 0, shuffle: Optional[bool] = None,
                seed: int = 0, prefetch: int = 2,
                local_rows: Optional[tuple] = None,
                start_batch: int = 0) -> Iterator[dict]:
        '''Yield batches for one epoch; deterministic per (seed, epoch).

        ``start_batch=k`` skips the first k batches WITHOUT loading them
        (the index order is fully determined by (seed, epoch) before any
        IO) — the exact-resume hook for preemption-interrupted epochs
        (utils/preempt.py).

        Shuffled epochs use torchtext-BucketIterator-style windowed length
        sorting (cfg.length_sort_window batches per pool): rows shuffle
        uniformly, each pool is then stably sorted by crop length so
        batchmates share a length bucket (a batch with one 384-frame
        outlier no longer pads 31 rows to 384), and finally the BATCH
        order is reshuffled so sequence length stays uncorrelated with
        the step index. Everything keys off (seed, epoch) — resume-safe.
        (The reference's BucketIterator is configured with a constant
        sort_key — captioning_dataset.py:51-52 — so it never actually
        length-sorts; this is a pure padding-waste optimization enabled
        by our bucketed static shapes. --length_sort_window 0 restores
        the uniform order.)'''
        if shuffle is None:
            shuffle = self.phase == 'train'
        order = np.arange(len(self.rows))
        rng = np.random.default_rng(seed + epoch)
        window = getattr(self.cfg, 'length_sort_window', 100) or 0
        if shuffle:
            rng.shuffle(order)
            if window > 1:
                lens = self._sort_lens()
                pool = window * self.batch_size
                order = np.concatenate([
                    chunk[np.argsort(lens[chunk], kind='stable')]
                    for chunk in (order[i:i + pool]
                                  for i in range(0, len(order), pool))])
        index_batches = [order[i:i + self.batch_size].tolist()
                         for i in range(0, len(order), self.batch_size)]
        if shuffle and window > 1:
            rng.shuffle(index_batches)
        if start_batch:
            index_batches = index_batches[start_batch:]
        make = (self.make_batch if local_rows is None else
                (lambda idx: self.make_batch(idx, local_rows)))
        yield from _prefetched(make, index_batches, prefetch)


def _prefetched(make_batch, index_batches, depth: int):
    '''Background-thread prefetch: overlap feature IO with device compute.'''
    if depth <= 0:
        for idx in index_batches:
            yield make_batch(idx)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    abandoned = threading.Event()

    def put_or_abandon(item) -> bool:
        '''Bounded put with an abandon check: if the consumer left
        mid-epoch (train step raised), give up instead of blocking forever
        with assembled batches pinned in memory.'''
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for idx in index_batches:
                if not put_or_abandon(make_batch(idx)):
                    return
        except BaseException as e:  # surface worker errors to the consumer
            put_or_abandon(e)
        put_or_abandon(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
    finally:
        abandoned.set()
