'''Corpus BLEU with pycocoevalcap-compatible smoothing and brevity penalty.

Reproduces the observable behaviour of pycocoevalcap's Bleu/BleuScorer
(the reference scores through it — evaluation/evaluate.py:60): per-call
corpus statistics with clipped n-gram counts, 'closest' reference-length
selection, epsilon smoothing (small=1e-9, tiny=1e-15) and exponential
brevity penalty applied to cumulative geometric means.
'''
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

_SMALL = 1e-9
_TINY = 1e-15


def _ngram_counts(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + k])
                   for k in range(1, n + 1)
                   for i in range(len(tokens) - k + 1))


def _closest_ref_len(hyp_len: int, ref_lens: List[int]) -> int:
    return min(ref_lens, key=lambda r: (abs(r - hyp_len), r))


class BleuScorer:
    def __init__(self, n: int = 4):
        self.n = n
        self.correct = [0] * n
        self.guess = [0] * n
        self.testlen = 0
        self.reflen = 0

    def add(self, hyp: str, refs: List[str]):
        hyp_toks = hyp.split()
        refs_toks = [r.split() for r in refs]
        self.testlen += len(hyp_toks)
        self.reflen += _closest_ref_len(len(hyp_toks),
                                        [len(r) for r in refs_toks])

        hyp_counts = _ngram_counts(hyp_toks, self.n)
        max_ref: Counter = Counter()
        for rt in refs_toks:
            for ng, c in _ngram_counts(rt, self.n).items():
                if c > max_ref[ng]:
                    max_ref[ng] = c

        for ng, c in hyp_counts.items():
            k = len(ng) - 1
            self.correct[k] += min(c, max_ref.get(ng, 0))
        for k in range(self.n):
            self.guess[k] += max(0, len(hyp_toks) - k)

    def compute(self) -> List[float]:
        bleus = []
        bleu = 1.0
        for k in range(self.n):
            bleu *= (self.correct[k] + _TINY) / (self.guess[k] + _SMALL)
            bleus.append(bleu ** (1.0 / (k + 1)))
        ratio = (self.testlen + _TINY) / (self.reflen + _SMALL)
        if ratio < 1:
            import math
            bp = math.exp(1 - 1 / ratio)
            bleus = [b * bp for b in bleus]
        return bleus


def compute_bleu(gts: Dict, res: Dict, n: int = 4) -> Tuple[List[float], List[List[float]]]:
    '''pycocoevalcap Bleu interface: gts/res dict[key -> list[str]];
    res has exactly one hypothesis per key. Returns (corpus_scores, per_key).'''
    scorer = BleuScorer(n)
    per_key = []
    for k in sorted(gts.keys(), key=str):
        assert len(res[k]) == 1
        single = BleuScorer(n)
        single.add(res[k][0], gts[k])
        per_key.append(single.compute())
        scorer.add(res[k][0], gts[k])
    return scorer.compute(), per_key
