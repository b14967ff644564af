'''METEOR scorer, pure Python.

The reference scores METEOR through the Java meteor-1.5.jar subprocess
(pycocoevalcap; reference: evaluation/evaluate.py:19, 61). No JVM is assumed
here: this module implements the classic METEOR algorithm (Banerjee & Lavie
2005, as in nltk.translate.meteor_score) with

    alpha = 0.9, beta = 3, gamma = 0.5,
    match stages: exact (w=1.0) + Porter stem (w=0.6),

The WordNet synonym and paraphrase stages require data files the environment
does not ship; scores therefore deviate slightly (downward) from the Java
METEOR 1.5 on captions whose only overlaps are synonymous. If a
meteor-1.5.jar is available on disk, set the ``METEOR_JAR`` env var and the
Java subprocess path is used instead for bit-parity with the reference.
'''
from __future__ import annotations

import os
import subprocess
import threading
from typing import Dict, List, Tuple

from bmt_tpu.evaluation.stemmer import porter_stem

# classic METEOR parameters (Banerjee & Lavie 2005, as in nltk):
# fmean weight alpha, penalty Pen = gamma * (chunks/matches)^beta.
# Identical sentences score ~1.0 under these.
ALPHA = 0.9
BETA = 3.0
GAMMA = 0.5
W_EXACT = 1.0
W_STEM = 0.6


def _align(hyp: List[str], ref: List[str]):
    '''Two-stage greedy alignment (exact, then stem), preferring matches
    adjacent to the previous aligned position to minimize chunks.

    Returns list of (hyp_idx, ref_idx, weight).
    '''
    matches = []
    used_ref = [False] * len(ref)
    used_hyp = [False] * len(hyp)

    stages = [
        (W_EXACT, hyp, ref),
        (W_STEM, [porter_stem(w) for w in hyp], [porter_stem(w) for w in ref]),
    ]

    for weight, h_toks, r_toks in stages:
        prev_ref = -1
        for i, hw in enumerate(h_toks):
            if used_hyp[i]:
                continue
            candidates = [j for j, rw in enumerate(r_toks)
                          if not used_ref[j] and rw == hw]
            if not candidates:
                continue
            # prefer the candidate following the previous match (chunk-min)
            j = min(candidates, key=lambda j: (abs(j - (prev_ref + 1)), j))
            matches.append((i, j, weight))
            used_hyp[i] = True
            used_ref[j] = True
            prev_ref = j
    return sorted(matches)


def _count_chunks(matches) -> int:
    if not matches:
        return 0
    chunks = 1
    for (h0, r0, _), (h1, r1, _) in zip(matches, matches[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def meteor_pair(hyp: str, ref: str) -> float:
    hyp_toks = hyp.split()
    ref_toks = ref.split()
    if not hyp_toks or not ref_toks:
        return 0.0
    matches = _align(hyp_toks, ref_toks)
    if not matches:
        return 0.0
    m = sum(w for _, _, w in matches)
    precision = m / len(hyp_toks)
    recall = m / len(ref_toks)
    if precision + recall == 0:
        return 0.0
    fmean = precision * recall / (ALPHA * precision + (1 - ALPHA) * recall)
    n_matches = len(matches)
    chunks = _count_chunks(matches)
    frag = chunks / n_matches if n_matches else 0.0
    penalty = GAMMA * (frag ** BETA)
    return fmean * (1.0 - penalty)


def meteor_sentence(hyp: str, refs: List[str]) -> float:
    return max((meteor_pair(hyp, r) for r in refs), default=0.0)


def compute_meteor(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    '''pycocoevalcap Meteor interface: average sentence METEOR over keys.'''
    jar = os.environ.get('METEOR_JAR')
    if jar and os.path.exists(jar):
        return _compute_meteor_java(jar, gts, res)
    per_key = []
    for k in sorted(gts.keys(), key=str):
        assert len(res[k]) == 1
        per_key.append(meteor_sentence(res[k][0], gts[k]))
    avg = sum(per_key) / len(per_key) if per_key else 0.0
    return avg, per_key


def _compute_meteor_java(jar: str, gts: Dict, res: Dict):
    '''Subprocess protocol of pycocoevalcap's Meteor wrapper (SCORE/EVAL
    lines on stdin) for bit-parity when the jar exists.'''
    keys = sorted(gts.keys(), key=str)
    cmd = ['java', '-jar', '-Xmx2G', jar, '-', '-', '-stdio', '-l', 'en',
           '-norm']
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, text=True)
    lock = threading.Lock()
    with lock:
        eval_line = 'EVAL'
        for k in keys:
            refs = [r.replace('|||', '').replace('  ', ' ') for r in gts[k]]
            hypo = res[k][0].replace('|||', '').replace('  ', ' ')
            score_line = ' ||| '.join(('SCORE', ' ||| '.join(refs), hypo))
            proc.stdin.write(score_line + '\n')
            proc.stdin.flush()
            eval_line += ' ||| ' + proc.stdout.readline().strip()
        proc.stdin.write(eval_line + '\n')
        proc.stdin.flush()
        per_key = [float(proc.stdout.readline().strip()) for _ in keys]
        avg = float(proc.stdout.readline().strip())
    proc.stdin.close()
    proc.wait()
    return avg, per_key
