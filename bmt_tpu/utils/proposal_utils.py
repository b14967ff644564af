'''Proposal post-processing utilities (host-side numpy + device-friendly ops).

Re-implements the reference utilities (reference: utilities/proposal_utils.py)
functionally: tIoU, k-means anchor priors, top-k selection, corner conversion,
duration trimming, NMS, and the `AnetPredictions` submission accumulator.

These run on the host over small (B, k, 3) arrays — post-processing is not a
device bottleneck; the device path ends at the proposal tensor.
'''
from __future__ import annotations

import json
import os
from time import time

import numpy as np


def tiou_vectorized(segments1: np.ndarray, segments2: np.ndarray,
                    without_center_coords: bool = False,
                    center_length: bool = True) -> np.ndarray:
    '''Pairwise temporal IoU (reference: proposal_utils.py:11-57).

    segments*: (M, 2) / (N, 2) as [center, length] (center_length=True) or
    [start, end]. With without_center_coords, inputs are (M, 1) lengths.
    Returns (M, N).
    '''
    if without_center_coords:
        segments1 = np.concatenate([np.zeros_like(segments1), segments1], 1)
        segments2 = np.concatenate([np.zeros_like(segments2), segments2], 1)

    if center_length:
        start1 = segments1[:, 0] - segments1[:, 1] / 2
        end1 = segments1[:, 0] + segments1[:, 1] / 2
        start2 = segments2[:, 0] - segments2[:, 1] / 2
        end2 = segments2[:, 0] + segments2[:, 1] / 2
    else:
        start1, end1 = segments1[:, 0], segments1[:, 1]
        start2, end2 = segments2[:, 0], segments2[:, 1]

    start1, end1 = start1[:, None], end1[:, None]
    start2, end2 = start2[None, :], end2[None, :]

    intersection = np.clip(np.minimum(end1, end2) - np.maximum(start1, start2),
                           0.0, None)
    union = (end1 - start1) + (end2 - start2) - intersection
    union = np.minimum(np.maximum(end1, end2) - np.minimum(start1, start2),
                       union)
    return intersection / (union + 1e-8)


def read_segment_lengths_from_json(train_json_path: str) -> np.ndarray:
    '''GT segment lengths in seconds, non-positive dropped
    (reference: proposal_utils.py:60-81).'''
    with open(train_json_path) as f:
        train_dict = json.load(f)
    lengths = []
    for _video_id, info in train_dict.items():
        for start, end in info['timestamps']:
            seg = float(end) - float(start)
            if seg > 0:
                lengths.append(seg)
    return np.asarray(lengths, np.float32).reshape(-1, 1)


def calc_anchors_using_kmeans(train_json_path: str, k: int) -> list:
    '''K-means anchor priors over GT segment lengths; deterministic
    (random_state=13, init='random', n_init=1 — reference:
    proposal_utils.py:84-95). Uses sklearn when available for bit-parity with
    the anchors stored in reference checkpoints, else a numpy Lloyd solver
    with the same seeding scheme.'''
    lengths = read_segment_lengths_from_json(train_json_path)
    try:
        from sklearn.cluster import KMeans
        km = KMeans(n_clusters=k, random_state=13, init='random', n_init=1)
        km.fit(lengths)
        centers = km.cluster_centers_.reshape(k)
    except ImportError:
        centers = _kmeans_1d(lengths.reshape(-1), k, seed=13)
    centers = np.sort(centers)
    return [float(c) for c in centers]


def _kmeans_1d(x: np.ndarray, k: int, seed: int, n_iter: int = 300,
               tol: float = 1e-4) -> np.ndarray:
    rs = np.random.RandomState(seed)
    centers = x[rs.choice(len(x), size=k, replace=False)].astype(np.float64)
    for _ in range(n_iter):
        assign = np.abs(x[:, None] - centers[None, :]).argmin(1)
        new = np.array([x[assign == j].mean() if np.any(assign == j)
                        else centers[j] for j in range(k)])
        shift = np.abs(new - centers).max()
        centers = new
        if shift < tol:
            break
    return centers


def calculate_f1(recall: float, precision: float) -> float:
    return 2 * recall * precision / (recall + precision + 1e-16)


def filter_meta_for_video_id(rows, video_id: str, key: str = 'video_id'):
    '''Select meta rows for one video (reference: proposal_utils.py:103-104;
    operates on row-dict lists instead of DataFrames).'''
    return [r for r in rows if r[key] == video_id]


def get_center_coords(start_end: np.ndarray) -> np.ndarray:
    '''[start, end] -> centers (reference: proposal_utils.py:107-109).'''
    return start_end[:, 0] + (start_end[:, 1] - start_end[:, 0]) / 2


def get_segment_lengths(start_end: np.ndarray) -> np.ndarray:
    '''[start, end] -> lengths (reference: proposal_utils.py:121-123).'''
    return start_end[:, 1] - start_end[:, 0]


def add_dict_to_another_dict(one_dict: dict, another_dict: dict) -> dict:
    '''Accumulate loss dicts (reference: proposal_utils.py:126-128).'''
    return {k: another_dict.get(k, 0) + v for k, v in one_dict.items()}


def select_topk_predictions(model_output: np.ndarray, k: int) -> np.ndarray:
    '''(B, AS, 3) -> (B, k, 3) sorted by confidence desc
    (reference: proposal_utils.py:136-149). Uses a stable descending argsort
    matching torch ``argsort(descending=True)`` ordering.'''
    conf = model_output[:, :, 2]
    order = np.argsort(-conf, axis=1, kind='stable')
    sorted_out = np.take_along_axis(model_output, order[:, :, None], axis=1)
    return sorted_out[:, :k, :]


def get_corner_coords(predictions: np.ndarray) -> np.ndarray:
    '''[center, length, conf] -> [start, end, conf]
    (reference: proposal_utils.py:112-118). Pure (no in-place).'''
    starts = predictions[..., 0] - predictions[..., 1] / 2
    ends = predictions[..., 0] + predictions[..., 1] / 2
    return np.stack([starts, ends, predictions[..., 2]], axis=-1)


def trim_proposals(model_output: np.ndarray,
                   duration_in_secs) -> np.ndarray:
    '''Clip starts/ends into [0, duration] (reference:
    proposal_utils.py:152-161).'''
    durations = np.asarray(duration_in_secs, np.float32).reshape(-1, 1)
    out = model_output.copy()
    out[..., 0] = np.clip(out[..., 0], 0.0, None)
    out[..., 0] = np.minimum(out[..., 0], durations)
    out[..., 1] = np.minimum(out[..., 1], durations)
    return out


def remove_very_short_segments(model_output: np.ndarray,
                               shortest_segment_prior: float) -> np.ndarray:
    '''Drop corner-form segments shorter than the prior (B=1 path; reference:
    proposal_utils.py:163-172).'''
    lengths = (model_output[..., 1] - model_output[..., 0]).reshape(-1)
    return model_output[:, lengths > shortest_segment_prior, :]


def non_max_suppression(video_preds: np.ndarray,
                        tIoU_threshold: float) -> np.ndarray:
    '''Greedy NMS over confidence-sorted (AS, 3) corner-form predictions
    (reference: proposal_utils.py:175-193).'''
    kept = []
    preds = video_preds
    while len(preds) > 0:
        kept.append(preds[0:1, :])
        if len(preds) == 1:
            break
        tious = tiou_vectorized(preds[0:1, :2], preds[1:, :2],
                                center_length=False).reshape(-1)
        preds = preds[1:][tious < tIoU_threshold]
    return np.concatenate(kept, axis=0)


# torch-compatible alias (the reference misspells it)
non_max_suppresion = non_max_suppression


def postprocess_preds(model_output: np.ndarray, cfg, batch: dict) -> np.ndarray:
    '''top-k -> corner coords -> trim (reference: proposal_utils.py:195-212).'''
    out = select_topk_predictions(model_output, k=cfg.max_prop_per_vid)
    out = get_corner_coords(out)
    out = trim_proposals(out, batch['duration_in_secs'])
    return out


class AnetPredictions:
    '''Accumulates per-batch proposal predictions into an ActivityNet
    submission JSON and scores them (reference: proposal_utils.py:215-301).'''

    def __init__(self, cfg, phase: str, epoch: int):
        self.predictions = {
            'version': 'VERSION 1.0',
            'external_data': {'used': True, 'details': ''},
            'results': {},
        }
        self.phase = phase
        self.epoch = epoch
        self.cfg = cfg
        self.segments_used = 0
        self.segments_total = 0
        self.num_vid_w_no_props = 0
        self.submission_path = None

    def add_new_predictions(self, model_output: np.ndarray, batch: dict):
        model_output = postprocess_preds(np.asarray(model_output), self.cfg,
                                         batch)
        B, k, _D = model_output.shape
        num_written = 0
        shortest_segment_prior = 0.2  # seconds

        for b in range(B):
            video_preds = model_output[b]
            vid_id = batch['video_ids'][b]
            if getattr(self.cfg, 'nms_tiou_thresh', None) is not None:
                video_preds = non_max_suppression(video_preds,
                                                  self.cfg.nms_tiou_thresh)
            vid_preds = []
            for start, end, conf in video_preds.tolist():
                start, end = round(start, 5), round(end, 5)
                if end - start > shortest_segment_prior:
                    vid_preds.append({
                        'sentence': '',
                        'proposal_score': round(conf, 5),
                        'timestamp': [start, end],
                    })
                    num_written += 1
            if vid_preds:
                self.predictions['results'][vid_id] = vid_preds
            else:
                self.num_vid_w_no_props += 1

        self.segments_total += B * k
        self.segments_used += num_written
        return num_written / B

    def write_anet_predictions_to_json(self):
        if self.phase != 'val_1':
            raise NotImplementedError('proposals are only dumped for val_1')
        # the scorer consumes this file even when logging is disabled
        # (--dont_log leaves cfg.log_path = None): fall back to ./tmp
        base = self.cfg.log_path if self.cfg.log_path else './tmp'
        folder = os.path.join(base, 'submissions')
        filename = (f'prop_results_{self.phase}_e{self.epoch}'
                    f'_maxprop{self.cfg.max_prop_per_vid}.json')
        self.submission_path = os.path.join(folder, filename)
        os.makedirs(folder, exist_ok=True)
        if os.path.exists(self.submission_path):
            self.submission_path = self.submission_path.replace(
                '.json', f'_{time()}.json')
        with open(self.submission_path, 'w') as f:
            json.dump(self.predictions, f)

    def evaluate_predictions(self):
        from bmt_tpu.evaluation.metrics import calculate_metrics
        if self.segments_total:
            used = (self.cfg.max_prop_per_vid * self.segments_used
                    / self.segments_total)
            print(f'{used:.2f} props/vid')
        if self.num_vid_w_no_props > 0:
            print(f'Number of videos with no proposals: '
                  f'{self.num_vid_w_no_props}')
        from bmt_tpu.utils.misc import HiddenPrints
        with HiddenPrints():
            return calculate_metrics(
                self.cfg.reference_paths, self.submission_path, self.cfg.tIoUs,
                self.cfg.max_prop_per_vid, verbose=True, only_proposals=True)
