'''Proposal-generation dataset: one item per video, full padded features and
dense static-shape YOLO targets.

Replaces ProposalGenerationDataset (reference: datasets/proposal_dataset.py):
- features are the full stacks padded to fixed lengths (audio 800, video 300
  by default) — already static shapes, ideal for XLA,
- per-video ground-truth events become dense (E_max,) center/length arrays
  with a validity mask (instead of the reference's ragged
  [batch_slot, center, length, meta_idx] rows),
- videos with missing features or non-positive segments are filtered, with
  the filter list cached on disk (reference: proposal_dataset.py:105-131).
'''
from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional

import numpy as np

from bmt_tpu.data.vocab import read_meta_csv


class ProposalDataset:

    def __init__(self, cfg, phase: str, pad_idx: int = 1,
                 cache_dir: str = './tmp'):
        self.cfg = cfg
        self.phase = phase
        self.pad_idx = pad_idx
        self.modality = cfg.modality
        meta_by_phase = {'train': cfg.train_meta_path,
                         'val_1': cfg.val_1_meta_path,
                         'val_2': cfg.val_2_meta_path}
        self.meta_path = meta_by_phase[phase]
        from bmt_tpu.data.assets import ensure_meta_file
        ensure_meta_file(self.meta_path)
        self.rows = read_meta_csv(self.meta_path)

        self.feature_names_list = []
        if 'video' in self.modality:
            self.feature_names_list.append(f'{cfg.video_feature_name}_features')
        if 'audio' in self.modality:
            self.feature_names_list.append(f'{cfg.audio_feature_name}_features')

        # group rows by video
        self.by_video: dict = {}
        for r in self.rows:
            self.by_video.setdefault(r['video_id'], []).append(r)
        video_ids = list(self.by_video.keys())

        print(f'Dataset size (before filtering, {phase}): {len(video_ids)}')
        self.cache_dir = cache_dir
        self.video_ids = self._filter(video_ids)
        print(f'Dataset size (after filtering, {phase}): {len(self.video_ids)}')

        self.max_events = getattr(cfg, 'max_events_per_video', 32)
        observed = max((len(v) for v in self.by_video.values()), default=1)
        self.max_events = max(self.max_events, observed)

        self.batch_size = (cfg.train_batch_size if phase == 'train'
                           else cfg.inference_batch_size)

    # -- filtering (cached) --------------------------------------------------
    def _filter(self, video_ids: List[str]) -> List[str]:
        bad = set()
        for vid, rows in self.by_video.items():
            if any(r['end'] - r['start'] <= 0 for r in rows):
                bad.add(vid)

        cache = os.path.join(
            self.cache_dir,
            f'filtered_ids_from_{self.phase}_for{self.modality}.json')
        if os.path.exists(cache):
            with open(cache) as f:
                bad.update(json.load(f))
            print(f'Loading filtered examples from: {cache}')
        else:
            # presence is tested directly instead of np.load-ing and
            # padding every video's full stacks — a metadata stat per
            # file, not a full read of the dataset. (A stale cache is
            # harmless for correctness: make_batch zero-fills any file
            # that disappeared after the cache was written.)
            missing = []
            for vid in video_ids:
                if any(not os.path.exists(p)
                       for p in self._feature_paths(vid)):
                    missing.append(vid)
            os.makedirs(self.cache_dir, exist_ok=True)
            with open(cache, 'w') as f:
                json.dump(missing, f)
            bad.update(missing)
        return [v for v in video_ids if v not in bad]

    def _feature_paths(self, video_id: str):
        paths = []
        if 'i3d_features' in self.feature_names_list:
            paths += [os.path.join(self.cfg.video_features_path,
                                   f'{video_id}_rgb.npy'),
                      os.path.join(self.cfg.video_features_path,
                                   f'{video_id}_flow.npy')]
        if 'vggish_features' in self.feature_names_list:
            paths.append(os.path.join(self.cfg.audio_features_path,
                                      f'{video_id}.npy'))
        return paths

    # -- batching ------------------------------------------------------------
    def __len__(self):
        if self.phase == 'train':
            return len(self.video_ids) // self.batch_size  # drop_last
        return (len(self.video_ids) + self.batch_size - 1) // self.batch_size

    def make_batch(self, video_ids: List[str],
                   local_rows: Optional[tuple] = None) -> dict:
        '''Full padded stacks for B videos through the native batch loader
        (mmap + C++ thread pool — the same hot path the captioning dataset
        uses; numpy fallback is bit-identical). Unreadable files zero-fill
        (reference fill_missing_features semantics), so a STALE filter
        cache degrades to zero features instead of crashing mid-epoch, and
        a missing/short rgb or flow stream zero-fills BOTH (the summed
        rgb+flow must never mix real frames of one stream with pads of the
        other).

        ``local_rows=(lo, hi)``: per-host sharded input pipeline — feature
        IO runs only for rows [lo, hi) (this process's dp block; see
        ``DataParallel.local_rows``); non-local rows stay zero and are
        never transferred. Proposal pad lengths are config-fixed, so
        batch geometry is host-independent by construction. Targets
        (centers/lengths/valid) come from in-memory metadata and stay
        global.'''
        from bmt_tpu.data.native import batch_load, npy_shape
        B = len(video_ids)
        lo, hi = (0, B) if local_rows is None else (
            max(local_rows[0], 0), min(local_rows[1], B))
        n_loc = max(hi - lo, 0)
        zeros = [0.0] * n_loc
        ones_d = [1.0] * n_loc
        full = [1] * n_loc
        pads = getattr(self.cfg, 'pad_feats_up_to', None) or {
            'video': self.cfg.pad_video_feats_up_to,
            'audio': self.cfg.pad_audio_feats_up_to}

        def _load(paths, pad, S, D):
            out = np.zeros((B, S, D), np.float32)
            st = np.zeros((B,), np.int32)
            if n_loc:
                out[lo:hi], st[lo:hi] = batch_load(
                    paths[lo:hi], zeros, zeros, ones_d, full, pad, S, D)
            return out, st

        src = {}
        if 'video' in self.modality:
            rgb_paths = [os.path.join(self.cfg.video_features_path,
                                      f'{v}_rgb.npy') for v in video_ids]
            flow_paths = [os.path.join(self.cfg.video_features_path,
                                       f'{v}_flow.npy') for v in video_ids]
            rgb, st_r = _load(rgb_paths, self.pad_idx, pads['video'],
                              self.cfg.d_vid)
            flow, st_f = _load(flow_paths, 0.0, pads['video'],
                               self.cfg.d_vid)
            either = (st_r | st_f).astype(bool)
            for i in range(lo, hi):   # lockstep check: local rows only
                try:
                    if npy_shape(rgb_paths[i])[0] != \
                            npy_shape(flow_paths[i])[0]:
                        either[i] = True   # I3D lockstep violated
                except FileNotFoundError:
                    pass                   # already status-flagged
            if either.any():
                rgb[either] = self.pad_idx
                rgb[either, 0] = 0.0
                flow[either] = 0.0
            src['rgb'], src['flow'] = rgb, flow
        if 'audio' in self.modality:
            aud_paths = [os.path.join(self.cfg.audio_features_path,
                                      f'{v}.npy') for v in video_ids]
            src['audio'], _ = _load(aud_paths, self.pad_idx, pads['audio'],
                                    self.cfg.d_aud)

        E = self.max_events
        centers = np.zeros((B, E), np.float32)
        lengths = np.zeros((B, E), np.float32)
        valid = np.zeros((B, E), bool)
        durations = []
        for b, vid in enumerate(video_ids):
            rows = self.by_video[vid]
            durations.append(rows[0]['duration'])
            for e, r in enumerate(rows[:E]):
                centers[b, e] = r['start'] + (r['end'] - r['start']) / 2
                lengths[b, e] = r['end'] - r['start']
                valid[b, e] = True

        return {
            'src': src,
            'centers': centers,
            'lengths': lengths,
            'valid': valid,
            'video_ids': list(video_ids),
            'duration_in_secs': durations,
        }

    def batches(self, epoch: int = 0, shuffle: Optional[bool] = None,
                seed: int = 0, prefetch: int = 2,
                local_rows: Optional[tuple] = None,
                start_batch: int = 0) -> Iterator[dict]:
        from bmt_tpu.data.captioning import _prefetched
        if shuffle is None:
            shuffle = self.phase == 'train'
        ids = list(self.video_ids)
        if shuffle:
            rng = np.random.default_rng(seed + epoch)
            rng.shuffle(ids)
        B = self.batch_size
        if self.phase == 'train':
            groups = [ids[i:i + B] for i in range(0, len(ids) - B + 1, B)]
        else:
            groups = [ids[i:i + B] for i in range(0, len(ids), B)]
        if start_batch:
            # exact-resume hook (utils/preempt.py): the group order is a
            # pure function of (seed, epoch), so skipping is IO-free
            groups = groups[start_batch:]
        make = (self.make_batch if local_rows is None else
                (lambda vids: self.make_batch(vids, local_rows)))
        yield from _prefetched(make, groups, prefetch)
