'''ActivityNet dense-captioning evaluation protocol.

Re-implementation of the Krishna et al. densevid_eval protocol as vendored in
the reference (reference: evaluation/evaluate.py:31-305): per-tIoU matching
of predicted segments against ground-truth segments; matched pairs scored
with BLEU / METEOR / ROUGE-L / CIDEr; unmatched predictions scored against a
random garbage string; detection precision / recall. The scorers are this
framework's pure-Python implementations (no Java) — see
``bmt_tpu.evaluation.meteor`` for the METEOR caveat.
'''
from __future__ import annotations

import json
import random
import string as _string
from typing import Dict, List

import numpy as np

from bmt_tpu.evaluation.bleu import compute_bleu
from bmt_tpu.evaluation.cider import compute_cider
from bmt_tpu.evaluation.meteor import compute_meteor
from bmt_tpu.evaluation.ptb_tokenizer import ptb_tokenize
from bmt_tpu.evaluation.rouge import compute_rouge


# Seeded: the reference draws fresh garbage per run (evaluate.py:217),
# making its metrics vary slightly run-to-run; a fixed stream keeps the
# protocol (garbage never matches real tokens) while making evaluations of
# identical inputs reproducible.
_GARBAGE_RNG = random.Random(0)


def random_string(n: int) -> str:
    return ''.join(_GARBAGE_RNG.choice(_string.ascii_lowercase)
                   for _ in range(n))


def remove_nonascii(text: str) -> str:
    return ''.join(c if ord(c) < 128 else ' ' for c in text)


def segment_iou(a, b) -> float:
    '''tIoU of [start, end] intervals (reference: evaluate.py:90-96).'''
    intersection = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = min(max(a[1], b[1]) - min(a[0], b[0]),
                (a[1] - a[0]) + (b[1] - b[0]))
    return intersection / (union + 1e-8)


class ANETcaptions:
    PREDICTION_FIELDS = ['results', 'version', 'external_data']

    def __init__(self, ground_truth_filenames=None, prediction_filename=None,
                 tious=None, max_proposals: int = 1000,
                 prediction_fields=PREDICTION_FIELDS, verbose: bool = False,
                 only_proposals: bool = False):
        if not tious:
            raise IOError('Please input a valid tIoU.')
        if not ground_truth_filenames:
            raise IOError('Please input a valid ground truth file.')
        if not prediction_filename:
            raise IOError('Please input a valid prediction file.')

        self.verbose = verbose
        self.only_proposals = only_proposals
        self.tious = tious
        self.max_proposals = max_proposals
        self.pred_fields = prediction_fields
        self.ground_truths = self._load_gts(ground_truth_filenames)
        self.prediction = self._load_prediction(prediction_filename)
        self.scores: Dict[str, List[float]] = {}

    def _load_prediction(self, path):
        with open(path) as f:
            submission = json.load(f)
        if not all(field in submission for field in self.pred_fields):
            raise IOError('Please input a valid prediction file.')
        return {vid: preds[:self.max_proposals]
                for vid, preds in submission['results'].items()}

    def _load_gts(self, filenames):
        gts = []
        for fn in filenames:
            with open(fn) as f:
                gts.append(json.load(f))
        return gts

    def get_gt_vid_ids(self):
        vid_ids = set()
        for gt in self.ground_truths:
            vid_ids |= set(gt.keys())
        return list(vid_ids)

    def evaluate(self):
        # re-seed the garbage stream per evaluation so scoring the SAME
        # submission twice in one process yields identical metrics (the
        # stream otherwise advances across calls)
        _GARBAGE_RNG.seed(0)
        self.scores = {}
        if not self.only_proposals:
            for tiou in self.tious:
                scores = self.evaluate_tiou(tiou)
                for metric, score in scores.items():
                    self.scores.setdefault(metric, []).append(score)
        self.scores['Recall'] = []
        self.scores['Precision'] = []
        for tiou in self.tious:
            precision, recall = self.evaluate_detection(tiou)
            self.scores['Recall'].append(recall)
            self.scores['Precision'].append(precision)

    def evaluate_detection(self, tiou):
        '''Reference: evaluate.py:136-167.'''
        gt_vid_ids = self.get_gt_vid_ids()
        recall = [0.0] * len(gt_vid_ids)
        precision = [0.0] * len(gt_vid_ids)
        for vid_i, vid_id in enumerate(gt_vid_ids):
            best_recall = 0.0
            best_precision = 0.0
            for gt in self.ground_truths:
                if vid_id not in gt:
                    continue
                refs = gt[vid_id]
                ref_covered = set()
                pred_covered = set()
                if vid_id in self.prediction and self.prediction[vid_id]:
                    for pred_i, pred in enumerate(self.prediction[vid_id]):
                        for ref_i, ref_ts in enumerate(refs['timestamps']):
                            if segment_iou(pred['timestamp'], ref_ts) > tiou:
                                ref_covered.add(ref_i)
                                pred_covered.add(pred_i)
                    new_precision = len(pred_covered) / (pred_i + 1)
                    best_precision = max(best_precision, new_precision)
                new_recall = len(ref_covered) / len(refs['timestamps'])
                best_recall = max(best_recall, new_recall)
            recall[vid_i] = best_recall
            precision[vid_i] = best_precision
        return (sum(precision) / len(precision),
                sum(recall) / len(recall))

    def evaluate_tiou(self, tiou):
        '''Reference: evaluate.py:169-262. Per-video averaging of scorer
        outputs over tIoU-matched (prediction, gt) caption pairs.'''
        gt_vid_ids = self.get_gt_vid_ids()
        vid2capid: Dict[str, List[int]] = {}
        cur_res: Dict[int, list] = {}
        cur_gts: Dict[int, list] = {}
        unique_index = 0

        for vid_id in gt_vid_ids:
            vid2capid[vid_id] = []
            if vid_id not in self.prediction:
                continue
            for pred in self.prediction[vid_id]:
                has_added = False
                for gt in self.ground_truths:
                    if vid_id not in gt:
                        continue
                    gt_caps = gt[vid_id]
                    for cap_idx, cap_ts in enumerate(gt_caps['timestamps']):
                        if segment_iou(pred['timestamp'], cap_ts) >= tiou:
                            cur_res[unique_index] = [
                                {'caption': remove_nonascii(pred['sentence'])}]
                            cur_gts[unique_index] = [
                                {'caption': remove_nonascii(
                                    gt_caps['sentences'][cap_idx])}]
                            vid2capid[vid_id].append(unique_index)
                            unique_index += 1
                            has_added = True
                if not has_added:
                    cur_res[unique_index] = [
                        {'caption': remove_nonascii(pred['sentence'])}]
                    cur_gts[unique_index] = [
                        {'caption': random_string(
                            _GARBAGE_RNG.randint(10, 20))}]
                    vid2capid[vid_id].append(unique_index)
                    unique_index += 1

        tok_res = ptb_tokenize(cur_res)
        tok_gts = ptb_tokenize(cur_gts)

        scorers = [
            (compute_bleu, ['Bleu_1', 'Bleu_2', 'Bleu_3', 'Bleu_4']),
            (compute_meteor, 'METEOR'),
            (compute_rouge, 'ROUGE_L'),
            (compute_cider, 'CIDEr'),
        ]

        output = {}
        for scorer, method in scorers:
            if scorer is compute_meteor:
                # METEOR dominates scoring wall-clock (beam aligner, pure
                # Python) — batch the whole video loop into one call so it
                # can shard across worker processes (meteor.py)
                from bmt_tpu.evaluation.meteor import (
                    compute_meteor_corpus_scores)
                tasks = {vid: ({k: tok_gts[k] for k in vid2capid[vid]},
                               {k: tok_res[k] for k in vid2capid[vid]})
                         for vid in gt_vid_ids}
                all_scores = compute_meteor_corpus_scores(tasks)
            else:
                all_scores = {}
                for vid_id in gt_vid_ids:
                    keys = vid2capid[vid_id]
                    res = {k: tok_res[k] for k in keys}
                    gts = {k: tok_gts[k] for k in keys}
                    if not res or not gts:
                        score = ([0.0] * len(method)
                                 if isinstance(method, list) else 0.0)
                    else:
                        score, _ = scorer(gts, res)
                    all_scores[vid_id] = score
            if isinstance(method, list):
                means = np.mean(list(all_scores.values()), axis=0)
                for m, name in enumerate(method):
                    output[name] = float(means[m])
                    if self.verbose:
                        print(f'Calculated tIoU: {tiou:1.1f}, {name}: '
                              f'{output[name]:0.3f}')
            else:
                output[method] = float(np.mean(list(all_scores.values())))
                if self.verbose:
                    print(f'Calculated tIoU: {tiou:1.1f}, {method}: '
                          f'{output[method]:0.3f}')
        return output
