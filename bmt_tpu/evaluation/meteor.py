'''METEOR 1.5 scorer, pure Python.

The reference scores METEOR through the Java meteor-1.5.jar subprocess
(pycocoevalcap; reference: evaluation/evaluate.py:19, 61, invoked as
``java -jar meteor-1.5.jar - - -stdio -l en -norm``). No JVM or jar is
available in this environment, so this module re-implements the METEOR 1.5
algorithm (Denkowski & Lavie 2014, "Meteor Universal") directly:

  * matcher stages with stage weights: exact (1.0), stem (0.6),
    synonym (0.8) — the stemmer is Snowball English (Porter2), the same
    stemmer family the jar uses (org.tartarus.snowball.ext.englishStemmer);
  * a beam-search aligner that maximizes matched words, then minimizes
    chunks, then minimizes total match distance (Meteor's Aligner ordering);
  * content/function word weighting delta, fragmentation penalty
    gamma * (chunks / mean_matches)^beta, and F-mean alpha with the
    METEOR 1.5 English parameters alpha=0.85, beta=0.2, gamma=0.6,
    delta=0.75;
  * corpus-level scores computed from SUMMED sufficient statistics across
    segments (the jar's ``EVAL ||| stats...`` aggregate line), NOT the mean
    of per-segment scores;
  * per-segment multi-reference handling: statistics are computed against
    every reference and the best-scoring reference's statistics are kept.

Known deviations from the jar (documented, unavoidable offline):
  * The WordNet-derived synonym stage and the paraphrase-table stage need
    data files this environment does not ship. The synonym stage activates
    if ``METEOR_SYNONYMS`` points at a JSON file mapping word -> list of
    synset ids; otherwise only exact+stem run. Scores therefore deviate
    slightly DOWNWARD from the jar on captions whose only overlaps are
    synonymous/paraphrastic.
  * The English function-word list (resources/function/en.words inside the
    jar) is approximated by a standard closed-class list below.

If a meteor-1.5.jar is available on disk, set the ``METEOR_JAR`` env var
and the Java subprocess path is used instead for bit-parity.
'''
from __future__ import annotations

import atexit
import json
import os
import subprocess
import sys
import threading
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

# METEOR 1.5 English parameters (meteor-1.5 resources: language 'en',
# default task): alpha (F-mean), beta (penalty exponent), gamma (penalty
# weight), delta (content-word weight).
ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
DELTA = 0.75
# stage weights: exact, stem, synonym (paraphrase would be 0.6)
STAGE_WEIGHTS = (1.0, 0.6, 0.8)
N_STAGES = 3
BEAM = 40  # Meteor Aligner beam width

# nltk (the Snowball/Porter2 stemmer) is imported lazily so that merely
# importing the trainer/eval stack does not require it; METEOR's stem stage
# degrades to exact-only matching with a one-time warning if it is absent.
_STEMMER = None
_STEM_WARNED = False


def _get_stemmer():
    global _STEMMER, _STEM_WARNED
    if _STEMMER is None and not _STEM_WARNED:
        try:
            from nltk.stem.snowball import SnowballStemmer
            _STEMMER = SnowballStemmer('english')
        except ImportError:
            _STEM_WARNED = True
            import warnings
            warnings.warn('nltk unavailable: METEOR stem stage disabled '
                          '(scores will read lower than with Snowball '
                          'stemming)', stacklevel=2)
    return _STEMMER

# Approximation of meteor-1.5's English function-word list (en.words):
# closed-class words — determiners, prepositions, conjunctions, pronouns,
# auxiliaries, and high-frequency particles. Punctuation is stripped
# upstream by the PTB tokenizer so it is not listed.
_FUNCTION_WORDS = frozenset('''
a an the this that these those some any each every no all both either
neither much many more most few little less least own same such
and or but nor so yet for as if then than because while although though
since unless until whether where when why how what which who whom whose
of in on at by with from into onto over under above below between among
through during before after behind beside besides against about around
across along near off out up down to toward towards upon within without
i you he she it we they me him her us them my your his its our their
mine yours hers ours theirs myself yourself himself herself itself
ourselves themselves yourselves oneself
be am is are was were been being
have has had having do does did doing
will would shall should can could may might must ought
not n't there here also just only even still too very quite rather
'''.split())


@lru_cache(maxsize=65536)
def _stem(word: str) -> str:
    stemmer = _get_stemmer()
    return stemmer.stem(word) if stemmer is not None else word


def _load_synonyms() -> Optional[Dict[str, frozenset]]:
    path = os.environ.get('METEOR_SYNONYMS')
    if not path or not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    return {w: frozenset(ids) for w, ids in raw.items()}


# lazily (re)loaded keyed on the env value: like METEOR_JAR, setting
# METEOR_SYNONYMS after this module was imported must still activate the
# synonym stage (an import-time freeze would silently disable it)
_synonyms_cache: Dict = {'key': object(), 'table': None}


def _get_synonyms() -> Optional[Dict[str, frozenset]]:
    path = os.environ.get('METEOR_SYNONYMS')
    if _synonyms_cache['key'] != path:
        _synonyms_cache['key'] = path
        _synonyms_cache['table'] = _load_synonyms()
    return _synonyms_cache['table']


@dataclass
class MeteorStats:
    '''Sufficient statistics of one alignment (or a sum over segments) —
    mirrors meteor-1.5's MeteorStats: lengths, per-stage content/function
    match counts for both sides, total matched words, chunks.'''
    test_len: int = 0
    ref_len: int = 0
    test_func: int = 0
    ref_func: int = 0
    # per stage: matches that are content / function words, each side
    tmc: List[int] = field(default_factory=lambda: [0] * N_STAGES)
    tmf: List[int] = field(default_factory=lambda: [0] * N_STAGES)
    rmc: List[int] = field(default_factory=lambda: [0] * N_STAGES)
    rmf: List[int] = field(default_factory=lambda: [0] * N_STAGES)
    test_matches: int = 0
    ref_matches: int = 0
    chunks: int = 0

    def add(self, other: 'MeteorStats') -> None:
        self.test_len += other.test_len
        self.ref_len += other.ref_len
        self.test_func += other.test_func
        self.ref_func += other.ref_func
        for s in range(N_STAGES):
            self.tmc[s] += other.tmc[s]
            self.tmf[s] += other.tmf[s]
            self.rmc[s] += other.rmc[s]
            self.rmf[s] += other.rmf[s]
        self.test_matches += other.test_matches
        self.ref_matches += other.ref_matches
        self.chunks += other.chunks

    def score(self) -> float:
        w_len_t = (DELTA * (self.test_len - self.test_func)
                   + (1 - DELTA) * self.test_func)
        w_len_r = (DELTA * (self.ref_len - self.ref_func)
                   + (1 - DELTA) * self.ref_func)
        if w_len_t <= 0 or w_len_r <= 0:
            return 0.0
        w_m_t = sum(STAGE_WEIGHTS[s] * (DELTA * self.tmc[s]
                                        + (1 - DELTA) * self.tmf[s])
                    for s in range(N_STAGES))
        w_m_r = sum(STAGE_WEIGHTS[s] * (DELTA * self.rmc[s]
                                        + (1 - DELTA) * self.rmf[s])
                    for s in range(N_STAGES))
        precision = w_m_t / w_len_t
        recall = w_m_r / w_len_r
        if precision + recall == 0:
            return 0.0
        fmean = (precision * recall
                 / (ALPHA * precision + (1 - ALPHA) * recall))
        total = self.test_matches + self.ref_matches
        if total == 0 or self.chunks == 0:
            penalty = 0.0
        else:
            frag = self.chunks / (total / 2.0)
            penalty = GAMMA * frag ** BETA
        return fmean * (1.0 - penalty)


def _candidates(hyp: Sequence[str], ref: Sequence[str]):
    '''For each hyp index, candidate (ref_index, stage) matches; stage is
    the LOWEST (highest-weight) stage under which the pair matches.'''
    ref_stems = [_stem(w) for w in ref]
    hyp_stems = [_stem(w) for w in hyp]
    synonyms = _get_synonyms()
    out: List[List[Tuple[int, int]]] = []
    for i, hw in enumerate(hyp):
        cands: List[Tuple[int, int]] = []
        for j, rw in enumerate(ref):
            if hw == rw:
                cands.append((j, 0))
            elif hyp_stems[i] == ref_stems[j]:
                cands.append((j, 1))
            elif (synonyms is not None
                  and synonyms.get(hw, frozenset())
                  & synonyms.get(rw, frozenset())):
                cands.append((j, 2))
        out.append(cands)
    return out


def _align(hyp: Sequence[str], ref: Sequence[str]):
    '''Beam search over hypothesis positions for the one-to-one alignment
    that (1) maximizes matched words, (2) minimizes chunks, (3) minimizes
    summed |i-j| distance — Meteor's Aligner resolution order.

    Returns a list of (hyp_idx, ref_idx, stage), sorted by hyp_idx.

    This is the pure-Python aligner — the parity baseline for (and the
    fallback of) the native batched engine (native/meteor_align.cc),
    which corpus-level scoring dispatches to via
    :func:`_batch_best_ref_stats`.
    '''
    return _align_py(_candidates(hyp, ref), len(hyp))


def _align_py(cands, n_hyp: int):
    '''Pure-Python reference beam aligner (the native library's parity
    baseline and its fallback).'''
    # state: (n_matches, chunks, dist, last_i, last_j, used_ref, matches)
    States = List[Tuple[int, int, int, int, int, frozenset, tuple]]
    beam: States = [(0, 0, 0, -2, -2, frozenset(), ())]
    for i in range(n_hyp):
        nxt: States = []
        for (m, ch, d, li, lj, used, ms) in beam:
            nxt.append((m, ch, d, li, lj, used, ms))  # leave hyp[i] unmatched
            for (j, stage) in cands[i]:
                if j in used:
                    continue
                new_ch = ch + (0 if (li == i - 1 and lj == j - 1) else 1)
                nxt.append((m + 1, new_ch, d + abs(i - j), i, j,
                            used | {j}, ms + ((i, j, stage),)))
        nxt.sort(key=lambda s: (-s[0], s[1], s[2]))
        beam = nxt[:BEAM]
    best = beam[0]
    return list(best[6])


def _segment_stats(hyp: Sequence[str], ref: Sequence[str]) -> MeteorStats:
    st = MeteorStats(
        test_len=len(hyp), ref_len=len(ref),
        test_func=sum(w in _FUNCTION_WORDS for w in hyp),
        ref_func=sum(w in _FUNCTION_WORDS for w in ref),
    )
    matches = _align(hyp, ref)
    for (i, j, stage) in matches:
        if hyp[i] in _FUNCTION_WORDS:
            st.tmf[stage] += 1
        else:
            st.tmc[stage] += 1
        if ref[j] in _FUNCTION_WORDS:
            st.rmf[stage] += 1
        else:
            st.rmc[stage] += 1
    st.test_matches = len(matches)
    st.ref_matches = len(matches)
    if matches:
        chunks = 1
        for (h0, r0, _), (h1, r1, _) in zip(matches, matches[1:]):
            if not (h1 == h0 + 1 and r1 == r0 + 1):
                chunks += 1
        # Meteor quirk: a single chunk covering BOTH sentences entirely is
        # zero fragmentation (identical-modulo-stage sentences score with
        # no penalty).
        if (chunks == 1 and len(matches) == len(hyp)
                and len(matches) == len(ref)):
            chunks = 0
        st.chunks = chunks
    return st


def _norm_tokens(text: str) -> List[str]:
    '''The jar's -norm: lowercase + whitespace tokens. Inputs here are
    already PTB-tokenized (punctuation stripped) by the eval pipeline.'''
    return text.lower().split()


def best_ref_stats(hyp: str, refs: Sequence[str]) -> MeteorStats:
    '''Stats against the best-scoring reference (the jar's multi-reference
    behavior: stats computed per reference, best kept by segment score).'''
    hyp_toks = _norm_tokens(hyp)
    best: Optional[MeteorStats] = None
    best_score = -1.0
    for r in refs:
        st = _segment_stats(hyp_toks, _norm_tokens(r))
        sc = st.score()
        if sc > best_score:
            best, best_score = st, sc
    return best if best is not None else MeteorStats()


def _batch_best_ref_stats(
        items: Sequence[Tuple[str, Sequence[str]]]) -> List[MeteorStats]:
    '''Best-reference sufficient statistics for a list of segments —
    semantically ``[best_ref_stats(h, refs) for h, refs in items]``.

    When the native alignment engine is built (native/meteor_align.cc),
    every (hypothesis, reference) alignment in the batch runs in ONE
    ctypes call: Python interns tokens/stems/synonyms to integer ids and
    the C++ side does candidate generation + beam search + statistics
    across a thread pool, bit-identically to the Python aligner
    (differentially tested). The reference runs this same workload
    inside a persistent JVM (reference: evaluation/evaluate.py:19,61).
    Rare pairs the engine cannot serve (reference > 128 tokens) and the
    no-library case fall back to the pure-Python path.
    '''
    from bmt_tpu.evaluation import meteor_native
    if not meteor_native.enabled():
        return [best_ref_stats(h, refs) for h, refs in items]
    tok: List[Tuple[List[str], List[List[str]]]] = []
    pairs: List[Tuple[List[str], List[str]]] = []
    pair_map: List[Tuple[int, int]] = []
    for si, (h, refs) in enumerate(items):
        ht = _norm_tokens(h)
        rts = [_norm_tokens(r) for r in refs]
        tok.append((ht, rts))
        for ri, rt in enumerate(rts):
            pairs.append((ht, rt))
            pair_map.append((si, ri))
    got = meteor_native.batch_stats(pairs, _stem, _FUNCTION_WORDS,
                                    _get_synonyms(), BEAM)
    if got is None:                                  # pragma: no cover
        return [best_ref_stats(h, refs) for h, refs in items]
    rows, status = got
    # empty-reference segments keep the zero MeteorStats (best_ref_stats
    # parity); ties keep the FIRST reference (strict > , pair order = ref
    # order), also matching best_ref_stats
    out: List[MeteorStats] = [MeteorStats() for _ in items]
    best_sc = [-1.0] * len(items)
    for p, (si, ri) in enumerate(pair_map):
        ht, rts = tok[si]
        rt = rts[ri]
        if status[p] != 0:
            st = _segment_stats(ht, rt)
        else:
            r = rows[p]
            st = MeteorStats(
                test_len=len(ht), ref_len=len(rt),
                test_func=sum(w in _FUNCTION_WORDS for w in ht),
                ref_func=sum(w in _FUNCTION_WORDS for w in rt),
                tmc=[int(x) for x in r[0:3]], tmf=[int(x) for x in r[3:6]],
                rmc=[int(x) for x in r[6:9]], rmf=[int(x) for x in r[9:12]],
                test_matches=int(r[12]), ref_matches=int(r[12]),
                chunks=int(r[13]))
        sc = st.score()
        if sc > best_sc[si]:
            out[si], best_sc[si] = st, sc
    return out


def meteor_pair(hyp: str, ref: str) -> float:
    return best_ref_stats(hyp, [ref]).score()


def meteor_sentence(hyp: str, refs: List[str]) -> float:
    return best_ref_stats(hyp, refs).score()


def _score_chunk(pairs: List[Tuple[str, List[str]]]) -> List[MeteorStats]:
    '''Worker: sufficient stats for a list of (hypothesis, references)
    pairs. Top-level (picklable); uses the native engine when built.'''
    return _batch_best_ref_stats(pairs)


def _score_videos_chunk(items):
    '''Worker: per-video corpus scores for [(vid, gts, res), ...] — each
    video aggregates its segments' sufficient statistics (the densevid
    protocol averages per-video CORPUS scores across videos). All the
    chunk's segments go through one batched stats call.'''
    flat: List[Tuple[str, List[str]]] = []
    bounds = []
    for vid, gts, res in items:
        start = len(flat)
        for k in sorted(gts.keys(), key=str):
            flat.append((res[k][0], list(gts[k])))
        bounds.append((vid, start, len(flat)))
    stats = _batch_best_ref_stats(flat)
    out = []
    for vid, a, b in bounds:
        agg = MeteorStats()
        for st in stats[a:b]:
            agg.add(st)
        out.append((vid, agg.score()))
    return out


# Keys-per-call threshold below which process-parallel scoring is not
# worth the pool/IPC overhead; the learned-props eval scores ~10k
# segments per tIoU, far above it.
_PARALLEL_MIN_KEYS = 2000

# One persistent SPAWN-context pool (like the persistent JVM above).
# spawn, not fork: the caller is usually the training process, which
# holds XLA runtime threads and prefetch threads — forking a
# multi-threaded process can deadlock the child on locks held at fork
# time. Spawned workers re-import the parent's __main__ plus this
# (pure-Python) module tree — ~2 s when the entry script guards its
# top-level work with `if __name__ == '__main__'` (main.py and every
# bundled driver do); the cost is paid ONCE and amortized over every
# validation scoring call.
_score_pool = None
_score_pool_procs = 0


def _get_score_pool(n_procs: int):
    global _score_pool, _score_pool_procs
    if _score_pool is None or _score_pool_procs != n_procs:
        _shutdown_score_pool()
        import multiprocessing as mp
        _score_pool = mp.get_context('spawn').Pool(n_procs)
        _score_pool_procs = n_procs
        atexit.register(_shutdown_score_pool)
    return _score_pool


def _shutdown_score_pool():
    global _score_pool
    if _score_pool is not None:
        _score_pool.terminate()
        _score_pool.join()
    _score_pool = None


def compute_meteor(gts: Dict, res: Dict) -> Tuple[float, List[float]]:
    '''pycocoevalcap Meteor interface: per-segment scores plus ONE corpus
    score computed from summed sufficient statistics (the jar's final EVAL
    aggregate line) — not the mean of segment scores.

    Large batches (the learned-props eval scores ~10k matched segments
    per tIoU; the reference offloads this to a persistent JVM,
    evaluate.py:169-262) are sharded across a persistent SPAWN-context
    worker pool — ~3.6 s/10k single-core on this host, /nproc with
    workers. Set ``BMT_METEOR_PROCS=1`` to force serial; a pool failure
    or per-chunk timeout falls back to serial scoring.'''
    jar = os.environ.get('METEOR_JAR')
    if jar and os.path.exists(jar):
        return _compute_meteor_java(jar, gts, res)
    keys = sorted(gts.keys(), key=str)
    for k in keys:
        assert len(res[k]) == 1

    from bmt_tpu.evaluation import meteor_native
    n_procs = int(os.environ.get('BMT_METEOR_PROCS',
                                 min(8, os.cpu_count() or 1)))
    stats: Optional[List[MeteorStats]] = None
    # the native engine threads internally — the process pool would only
    # stack oversubscription on top of it
    if (len(keys) >= _PARALLEL_MIN_KEYS and n_procs > 1
            and not meteor_native.enabled()):
        try:
            pairs = [(res[k][0], list(gts[k])) for k in keys]
            chunk = (len(pairs) + n_procs - 1) // n_procs
            parts = [pairs[i:i + chunk]
                     for i in range(0, len(pairs), chunk)]
            pool = _get_score_pool(n_procs)
            # bounded wait (generous vs the ~4 s worst case measured):
            # a wedged pool degrades to serial scoring, never a hang
            async_res = pool.map_async(_score_chunk, parts)
            stats = [st for part in async_res.get(timeout=120)
                     for st in part]
        except Exception as e:                      # pragma: no cover
            print(f'meteor: parallel scoring failed ({e!r}); '
                  f'falling back to serial', file=sys.stderr)
            _shutdown_score_pool()
            stats = None
    if stats is None:
        stats = _batch_best_ref_stats([(res[k][0], list(gts[k]))
                                       for k in keys])

    per_key: List[float] = []
    agg = MeteorStats()
    for st in stats:
        per_key.append(st.score())
        agg.add(st)
    return agg.score(), per_key


def compute_meteor_corpus_scores(tasks: Dict) -> Dict[str, float]:
    '''Per-video corpus METEOR for the densevid protocol's video loop:
    ``tasks`` maps vid -> (gts, res) dicts; returns vid -> corpus score.

    This is THE hot-path entry (anet_eval.evaluate_tiou scores thousands
    of videos x 4 tIoUs per validation; the reference offloads it to a
    persistent JVM): the video list is sharded across the spawn-context
    worker pool when the total segment count is large enough. An empty
    video scores 0.0 (protocol behavior).'''
    jar = os.environ.get('METEOR_JAR')
    if jar and os.path.exists(jar):
        # per-video calls against the persistent JVM (protocol framing is
        # per compute_meteor call)
        return {vid: (_compute_meteor_java(jar, gts, res)[0] if gts else 0.0)
                for vid, (gts, res) in tasks.items()}

    items = [(vid, gts, res) for vid, (gts, res) in tasks.items() if gts]
    empty = {vid: 0.0 for vid, (gts, _) in tasks.items() if not gts}
    total_segments = sum(len(gts) for _, gts, _ in items)

    from bmt_tpu.evaluation import meteor_native
    n_procs = int(os.environ.get('BMT_METEOR_PROCS',
                                 min(8, os.cpu_count() or 1)))
    scores: Optional[Dict[str, float]] = None
    # native engine enabled -> the serial path below already parallelizes
    # (C++ thread pool inside the batched call); skip the process pool
    if (total_segments >= _PARALLEL_MIN_KEYS and n_procs > 1 and items
            and not meteor_native.enabled()):
        try:
            chunk = (len(items) + n_procs - 1) // n_procs
            parts = [items[i:i + chunk]
                     for i in range(0, len(items), chunk)]
            pool = _get_score_pool(n_procs)
            async_res = pool.map_async(_score_videos_chunk, parts)
            scores = {vid: s for part in async_res.get(timeout=300)
                      for vid, s in part}
        except Exception as e:                      # pragma: no cover
            print(f'meteor: parallel video scoring failed ({e!r}); '
                  f'falling back to serial', file=sys.stderr)
            _shutdown_score_pool()
            scores = None
    if scores is None:
        scores = {vid: s
                  for vid, s in _score_videos_chunk(items)}
    scores.update(empty)
    return scores


# One persistent JVM shared by every compute_meteor call (the densevid
# protocol scores per video — thousands of calls per validation — so a
# fresh JVM per call would dominate wall-clock), exactly like
# pycocoevalcap's Meteor wrapper keeps one live subprocess.
_java_proc = None
_java_lock = threading.Lock()


def _java_meteor_proc(jar: str):
    global _java_proc
    if _java_proc is None or _java_proc.poll() is not None:
        cmd = ['java', '-jar', '-Xmx2G', jar, '-', '-', '-stdio', '-l',
               'en', '-norm']
        _java_proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                      stdout=subprocess.PIPE, text=True)
        atexit.register(_kill_java_proc)
    return _java_proc


def _kill_java_proc():
    global _java_proc
    if _java_proc is not None and _java_proc.poll() is None:
        _java_proc.kill()
    _java_proc = None


def _compute_meteor_java(jar: str, gts: Dict, res: Dict):
    '''Subprocess protocol of pycocoevalcap's Meteor wrapper (SCORE/EVAL
    lines on stdin) for bit-parity when the jar exists. The JVM persists
    across calls; on a protocol error it is killed (not leaked) and the
    next call restarts it.'''
    keys = sorted(gts.keys(), key=str)
    with _java_lock:
        proc = _java_meteor_proc(jar)
        try:
            eval_line = 'EVAL'
            for k in keys:
                refs = [r.replace('|||', '').replace('  ', ' ')
                        for r in gts[k]]
                hypo = res[k][0].replace('|||', '').replace('  ', ' ')
                score_line = ' ||| '.join(('SCORE', ' ||| '.join(refs),
                                           hypo))
                proc.stdin.write(score_line + '\n')
                proc.stdin.flush()
                eval_line += ' ||| ' + proc.stdout.readline().strip()
            proc.stdin.write(eval_line + '\n')
            proc.stdin.flush()
            per_key = [float(proc.stdout.readline().strip()) for _ in keys]
            avg = float(proc.stdout.readline().strip())
        except Exception:
            _kill_java_proc()
            raise
    return avg, per_key
