'''CIDEr (consensus-based caption similarity), pycocoevalcap-compatible math.

TF-IDF n-gram vectors (n = 1..4) with document frequency computed over the
reference corpus of the current call, gaussian length penalty (sigma = 6),
scale factor 10.
'''
from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Tuple

N = 4
SIGMA = 6.0


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def compute_cider(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    keys = sorted(gts.keys(), key=str)

    # document frequency over reference sets
    doc_freq: Dict[tuple, int] = defaultdict(int)
    ref_counts = {}
    for k in keys:
        refs = [r.split() for r in gts[k]]
        counts = [ {ng: c for n in range(1, N + 1)
                    for ng, c in _ngrams(r, n).items()} for r in refs ]
        ref_counts[k] = counts
        seen = set()
        for c in counts:
            seen.update(c.keys())
        for ng in seen:
            doc_freq[ng] += 1

    log_ref_len = math.log(max(len(keys), 1e-12))

    def counts_to_vec(counts: Dict[tuple, int]):
        vec = [defaultdict(float) for _ in range(N)]
        norm = [0.0] * N
        length = 0
        for ng, tf in counts.items():
            df = math.log(max(doc_freq[ng], 1.0))
            n = len(ng) - 1
            vec[n][ng] = tf * (log_ref_len - df)
            norm[n] += vec[n][ng] ** 2
            if n == 0:
                length += tf
        norm = [math.sqrt(x) for x in norm]
        return vec, norm, length

    def sim(vh, nh, lh, vr, nr, lr):
        delta = lh - lr
        val = [0.0] * N
        for n in range(N):
            for ng, w in vh[n].items():
                # pycocoevalcap clips the hypothesis count, not the product
                val[n] += min(w, vr[n].get(ng, 0.0)) * vr[n].get(ng, 0.0)
            if nh[n] and nr[n]:
                val[n] /= nh[n] * nr[n]
            val[n] *= math.exp(-delta ** 2 / (2 * SIGMA ** 2))
        return val

    per_key = []
    for k in keys:
        assert len(res[k]) == 1
        hyp_counts = {ng: c for n in range(1, N + 1)
                      for ng, c in _ngrams(res[k][0].split(), n).items()}
        vh, nh, lh = counts_to_vec(hyp_counts)
        score = [0.0] * N
        for rc in ref_counts[k]:
            vr, nr, lr = counts_to_vec(rc)
            s = sim(vh, nh, lh, vr, nr, lr)
            score = [a + b for a, b in zip(score, s)]
        n_refs = max(len(ref_counts[k]), 1)
        avg = sum(score) / N / n_refs * 10.0
        per_key.append(avg)

    mean = sum(per_key) / len(per_key) if per_key else 0.0
    return mean, per_key
