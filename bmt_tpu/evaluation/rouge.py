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
    hyp_toks = hyp.split()
    scores = []
    for ref in refs:
        ref_toks = ref.split()
        lcs = _lcs_len(hyp_toks, ref_toks)
        prec = lcs / len(hyp_toks) if hyp_toks else 0.0
        rec = lcs / len(ref_toks) if ref_toks else 0.0
        if prec and rec:
            scores.append(((1 + BETA ** 2) * prec * rec)
                          / (rec + BETA ** 2 * prec))
        else:
            scores.append(0.0)
    return max(scores) if scores else 0.0


def compute_rouge(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    per_key = []
    for k in sorted(gts.keys(), key=str):
        assert len(res[k]) == 1
        per_key.append(rouge_l_sentence(res[k][0], gts[k]))
    avg = sum(per_key) / len(per_key) if per_key else 0.0
    return avg, per_key
