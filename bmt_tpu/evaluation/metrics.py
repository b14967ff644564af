'''Metric aggregation entry point (reference:
epoch_loops/captioning_epoch_loops.py:13-37).'''
from __future__ import annotations

from bmt_tpu.evaluation.anet_eval import ANETcaptions

PREDICTION_FIELDS = ['results', 'version', 'external_data']


def calculate_metrics(reference_paths, submission_path, tIoUs,
                      max_prop_per_vid, verbose: bool = True,
                      only_proposals: bool = False) -> dict:
    metrics = {}
    from bmt_tpu.data.assets import ensure_meta_file
    for ref in reference_paths:
        ensure_meta_file(ref)
    evaluator = ANETcaptions(reference_paths, submission_path, tIoUs,
                             max_prop_per_vid, PREDICTION_FIELDS, verbose,
                             only_proposals)
    evaluator.evaluate()

    for i, tiou in enumerate(tIoUs):
        metrics[tiou] = {}
        for metric in evaluator.scores:
            metrics[tiou][metric] = evaluator.scores[metric][i]

    metrics['Average across tIoUs'] = {}
    for metric in evaluator.scores:
        score = evaluator.scores[metric]
        metrics['Average across tIoUs'][metric] = sum(score) / len(score)
    return metrics
