'''ROUGE-L (LCS-based F-measure, beta = 1.2), pycocoevalcap-compatible.'''
from __future__ import annotations

from typing import Dict, List, Tuple

BETA = 1.2


def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l_sentence(hyp: str, refs: List[str]) -> float:
    '''pycocoevalcap Rouge.calc_score: the max precision and max recall are
    taken INDEPENDENTLY across references before combining into F (not a
    max over per-reference F-scores).'''
    hyp_toks = hyp.split()
    precs, recs = [], []
    for ref in refs:
        ref_toks = ref.split()
        lcs = _lcs_len(hyp_toks, ref_toks)
        precs.append(lcs / len(hyp_toks) if hyp_toks else 0.0)
        recs.append(lcs / len(ref_toks) if ref_toks else 0.0)
    prec_max = max(precs) if precs else 0.0
    rec_max = max(recs) if recs else 0.0
    if prec_max and rec_max:
        return ((1 + BETA ** 2) * prec_max * rec_max
                / (rec_max + BETA ** 2 * prec_max))
    return 0.0


def compute_rouge(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    per_key = []
    for k in sorted(gts.keys(), key=str):
        assert len(res[k]) == 1
        per_key.append(rouge_l_sentence(res[k][0], gts[k]))
    avg = sum(per_key) / len(per_key) if per_key else 0.0
    return avg, per_key
