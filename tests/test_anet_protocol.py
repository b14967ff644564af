'''Precise unit tests of the densevid eval protocol pieces: detection
precision/recall matching, segment tIoU, sentence assembly.'''
import json

import numpy as np
import pytest

from bmt_tpu.evaluation.anet_eval import ANETcaptions, segment_iou
from bmt_tpu.data.vocab import Vocab
from bmt_tpu.train.loops import ints_to_sentence


def test_segment_iou():
    assert segment_iou([0, 10], [0, 10]) == pytest.approx(1.0, abs=1e-6)
    assert segment_iou([0, 10], [5, 15]) == pytest.approx(1 / 3, abs=1e-6)
    assert segment_iou([0, 10], [20, 30]) == 0.0
    # nested: union uses min(span, sum-intersection) like the reference
    assert segment_iou([0, 10], [2, 4]) == pytest.approx(0.2, abs=1e-6)


def _write(tmp_path, name, obj):
    p = tmp_path / name
    with open(p, 'w') as f:
        json.dump(obj, f)
    return str(p)


def test_detection_precision_recall(tmp_path):
    '''Hand-computed case: video A has 2 GT segments, predictions cover one
    of them twice plus one miss -> recall 1/2, precision 2/3.'''
    gt = {'vidA': {'duration': 100.0,
                   'timestamps': [[0, 10], [50, 60]],
                   'sentences': ['a', 'b']}}
    pred = {'version': 'VERSION 1.0',
            'external_data': {'used': True, 'details': ''},
            'results': {'vidA': [
                {'sentence': 'x', 'timestamp': [0, 10]},
                {'sentence': 'y', 'timestamp': [1, 11]},
                {'sentence': 'z', 'timestamp': [80, 90]},
            ]}}
    gt_path = _write(tmp_path, 'gt.json', gt)
    pred_path = _write(tmp_path, 'pred.json', pred)

    ev = ANETcaptions([gt_path], pred_path, tious=[0.5], max_proposals=100,
                      only_proposals=True)
    precision, recall = ev.evaluate_detection(0.5)
    assert recall == pytest.approx(0.5)
    assert precision == pytest.approx(2 / 3)


def test_detection_multiple_refs_takes_best(tmp_path):
    '''With two reference files the per-video best P/R is used
    (reference: evaluate.py:142-165).'''
    gt1 = {'vidA': {'duration': 50.0, 'timestamps': [[0, 10]],
                    'sentences': ['a']}}
    gt2 = {'vidA': {'duration': 50.0, 'timestamps': [[0, 10], [20, 30]],
                    'sentences': ['a', 'b']}}
    pred = {'version': 'VERSION 1.0',
            'external_data': {'used': True, 'details': ''},
            'results': {'vidA': [{'sentence': 'x', 'timestamp': [0, 10]}]}}
    ev = ANETcaptions([_write(tmp_path, 'g1.json', gt1),
                       _write(tmp_path, 'g2.json', gt2)],
                      _write(tmp_path, 'p.json', pred),
                      tious=[0.5], only_proposals=True)
    precision, recall = ev.evaluate_detection(0.5)
    # best recall: 1/1 from gt1; best precision 1/1
    assert recall == 1.0 and precision == 1.0


def test_max_proposals_truncation(tmp_path):
    gt = {'v': {'duration': 10.0, 'timestamps': [[0, 5]],
                'sentences': ['a']}}
    preds = [{'sentence': 's', 'timestamp': [5 + i * 0.01, 6 + i * 0.01]}
             for i in range(10)] + [{'sentence': 'hit', 'timestamp': [0, 5]}]
    pred = {'version': 'VERSION 1.0',
            'external_data': {'used': True, 'details': ''},
            'results': {'v': preds}}
    ev = ANETcaptions([_write(tmp_path, 'g.json', gt)],
                      _write(tmp_path, 'p.json', pred),
                      tious=[0.5], max_proposals=5, only_proposals=True)
    # the matching 11th proposal was truncated away
    precision, recall = ev.evaluate_detection(0.5)
    assert recall == 0.0


def test_ints_to_sentence():
    vocab = Vocab(['<unk>', '<blank>', '<s>', '</s>', 'a', 'man', 'runs'])
    # drop <s>, cut at first </s>, join, capitalize
    assert ints_to_sentence([2, 4, 5, 6, 3, 6, 6], vocab) == 'A man runs'
    # no </s>: keep everything after <s>
    assert ints_to_sentence([2, 5, 6], vocab) == 'Man runs'
    # empty caption
    assert ints_to_sentence([2, 3], vocab) == ''
