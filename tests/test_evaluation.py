'''Evaluation stack tests: scorer sanity + golden-file validation against the
reference's published epoch-26 prediction dumps.

Golden anchor: scoring the reference's captioning_results_val_1_e26.json with
this framework's scorers reproduces the README-published BLEU (B@3 4.63,
B@4 1.99 averaged over val_1/val_2) — our val_1 numbers are 4.68/2.07,
val_2 4.57/1.91, avg 4.62/1.99. METEOR is the pure-Python METEOR 1.5
implementation (exact + Snowball-stem stages; no WordNet synonym /
paraphrase data offline): it scores the e26 dumps at val_1 9.67 / val_2
9.95 (avg 9.81) vs the jar's published 10.90 — ~1.1 low, attributable to
the two missing match stages. All framework-internal comparisons use this
scorer consistently.
'''
import os

import pytest

from bmt_tpu.evaluation.bleu import compute_bleu
from bmt_tpu.evaluation.cider import compute_cider
from bmt_tpu.evaluation.meteor import (MeteorStats, best_ref_stats,
                                       compute_meteor, meteor_pair)
from bmt_tpu.evaluation.ptb_tokenizer import ptb_tokenize_sentence
from bmt_tpu.evaluation.rouge import compute_rouge

REF_DATA = '/root/reference/data'
REF_RESULTS = '/root/reference/results'


def test_ptb_tokenizer():
    assert ptb_tokenize_sentence('A man is playing guitar.') == \
        ['a', 'man', 'is', 'playing', 'guitar']
    assert ptb_tokenize_sentence("He doesn't stop, he keeps going!") == \
        ['he', 'does', "n't", 'stop', 'he', 'keeps', 'going']
    # punctuation tokens dropped per the PTB punctuation list
    assert ptb_tokenize_sentence('Wait -- what?') == ['wait', 'what']


def test_meteor_stage_weights_and_delta():
    '''METEOR 1.5 semantics: exact matches outweigh stem matches (stage
    weight 1.0 vs 0.6) and content-word matches outweigh function-word
    matches (delta=0.75).'''
    # same coverage, one match exact vs stem
    exact = meteor_pair('dogs play outside', 'dogs play outside')
    stem = meteor_pair('dogs playing outside', 'dogs play outside')
    assert exact > stem
    # matched content word ('dog') worth more than matched function word
    # ('the') with identical lengths/coverage pattern
    content = meteor_pair('dog barked loud', 'dog jumped quietly')
    function = meteor_pair('the barked loud', 'the jumped quietly')
    assert content > function


def test_meteor_fragmentation_penalty():
    '''Contiguous matches form one chunk; scattered matches form many and
    are penalized (gamma * (chunks/mean_matches)^beta).'''
    ref = 'a b c d e f'
    contiguous = meteor_pair('a b c x y z', ref)
    scattered = meteor_pair('a x c y e z', ref)
    assert contiguous > scattered


def test_meteor_corpus_is_aggregate_not_mean():
    '''The corpus score comes from SUMMED sufficient statistics (jar EVAL
    aggregate), not the mean of segment scores.'''
    gts = {0: ['a man rides a horse on the beach today ok fine'],
           1: ['dogs']}
    res = {0: ['a man rides a horse on the beach today ok fine'],
           1: ['cats']}
    corpus, per_key = compute_meteor(gts, res)
    mean = sum(per_key) / len(per_key)
    # segment 1 contributes tiny lengths to the pooled stats, so the
    # aggregate is dominated by segment 0 and exceeds the naive mean
    assert corpus > mean + 0.05
    agg = MeteorStats()
    agg.add(best_ref_stats(res[0][0], gts[0]))
    agg.add(best_ref_stats(res[1][0], gts[1]))
    assert abs(corpus - agg.score()) < 1e-12


def test_bleu_identity_and_disjoint():
    gts = {0: ['a man is riding a horse']}
    res = {0: ['a man is riding a horse']}
    scores, _ = compute_bleu(gts, res)
    assert all(abs(s - 1.0) < 1e-6 for s in scores)

    res = {0: ['completely different words here now']}
    scores, _ = compute_bleu(gts, res)
    assert all(s < 0.01 for s in scores)


def test_rouge_cider_meteor_ordering():
    # multi-key corpus: CIDEr idf degenerates to zero with a single document
    # (log(1) reference corpus), matching pycocoevalcap behaviour
    gts = {0: ['a man is riding a horse on the beach'],
           1: ['two dogs play with a ball in the park'],
           2: ['a woman slices vegetables in the kitchen']}
    good = {0: ['a man is riding a horse near the beach'],
            1: ['two dogs play with a ball at the park'],
            2: ['a woman cuts vegetables in a kitchen']}
    bad = {0: ['purple elephants compute taxes quietly'],
           1: ['submarine quarterly reports ascend'],
           2: ['gravity inverts on thursdays']}
    for scorer in (compute_rouge, compute_cider, compute_meteor):
        g, _ = scorer(gts, good)
        b, _ = scorer(gts, bad)
        assert g > b, (scorer.__name__, g, b)


def test_meteor_identical_close_to_one():
    s = meteor_pair('a man is riding a horse', 'a man is riding a horse')
    assert s > 0.99


def test_meteor_stem_match_counts():
    exact = meteor_pair('the dog runs', 'the dog runs')
    stemmed = meteor_pair('the dog running', 'the dog runs')
    nothing = meteor_pair('a cat sat', 'the dog runs')
    assert exact > stemmed > nothing


@pytest.mark.skipif(not os.path.exists(REF_RESULTS),
                    reason='reference mount not available')
def test_golden_reference_e26_bleu():
    '''Scoring the reference's val_1 epoch-26 dump reproduces its published
    BLEU under this framework's scorers (harness parity anchor).'''
    from bmt_tpu.evaluation.metrics import calculate_metrics
    m = calculate_metrics([f'{REF_DATA}/val_1_no_missings.json'],
                          f'{REF_RESULTS}/captioning_results_val_1_e26.json',
                          [0.5], 100, verbose=False)
    avg = m['Average across tIoUs']
    assert abs(avg['Bleu_3'] * 100 - 4.68) < 0.1, avg['Bleu_3']
    assert abs(avg['Bleu_4'] * 100 - 2.07) < 0.1, avg['Bleu_4']
    # GT proposals -> detection P/R are 1.0 by construction
    assert avg['Recall'] == 1.0 and avg['Precision'] == 1.0
    # METEOR 1.5 (exact+stem, no synonym/paraphrase data offline) pins at
    # 9.67 on val_1; the jar's published val_1/val_2 average is 10.90, so
    # the offline scorer reads ~1.1 low — deviation documented in
    # bmt_tpu/evaluation/meteor.py
    assert abs(avg['METEOR'] * 100 - 9.67) < 0.15, avg['METEOR']


def test_rouge_multi_ref_max_prec_recall_independently():
    '''pycocoevalcap Rouge.calc_score takes max precision and max recall
    across references INDEPENDENTLY before combining into F.'''
    from bmt_tpu.evaluation.rouge import rouge_l_sentence
    # ref 'a' gives rec=1 (prec=0.5); ref 'a b c d' gives prec=1 (rec=0.5)
    # -> prec_max = rec_max = 1 -> F = 1.0 (a max over per-ref F would not)
    assert rouge_l_sentence('a b', ['a', 'a b c d']) == 1.0


def test_ptb_tokenizer_coreNLP_bracket_forms():
    '''CoreNLP ptb3Escaping turns brackets into -LRB-/-RRB- forms; after the
    Java tokenizer's -lowerCase they do NOT match pycocoevalcap's uppercase
    PUNCTUATIONS, so bracket tokens are KEPT normalized (reference quirk).'''
    from bmt_tpu.evaluation.ptb_tokenizer import ptb_tokenize_sentence
    toks = ptb_tokenize_sentence('a man (in red) runs')
    assert toks == ['a', 'man', '-lrb-', 'in', 'red', '-rrb-', 'runs']
    toks = ptb_tokenize_sentence('list [of] {things}')
    assert toks == ['list', '-lsb-', 'of', '-rsb-', '-lcb-', 'things',
                    '-rcb-']


def test_anet_eval_reproducible_garbage():
    '''Scoring identical inputs twice yields identical metrics (the
    unmatched-prediction garbage stream is seeded). Reset the stream on
    both sides — other tests in the session may have advanced it.'''
    import random as _random
    from bmt_tpu.evaluation import anet_eval
    anet_eval._GARBAGE_RNG = _random.Random(0)
    s1 = [anet_eval.random_string(8) for _ in range(3)]
    anet_eval._GARBAGE_RNG = _random.Random(0)
    s2 = [anet_eval.random_string(8) for _ in range(3)]
    assert s1 == s2


def test_anet_eval_reproducible_end_to_end(tmp_path):
    '''Scoring the SAME submission twice through the full evaluator (with
    unmatched predictions hitting the garbage path, both caption length
    and content) yields bit-identical metrics — regardless of global RNG
    state between the runs.'''
    import json
    import random as _random
    from bmt_tpu.evaluation.anet_eval import ANETcaptions

    gt = {'v_a': {'duration': 30.0,
                  'timestamps': [[0.0, 10.0], [12.0, 25.0]],
                  'sentences': ['a man runs fast', 'a dog jumps high']}}
    # second prediction deliberately misses every GT timestamp at
    # tIoU 0.5 -> garbage-reference branch
    sub = {'version': 'VERSION 1.0', 'external_data': {},
           'results': {'v_a': [
               {'timestamp': [0.0, 10.0], 'sentence': 'a man runs fast'},
               {'timestamp': [27.0, 29.0], 'sentence': 'something else'}]}}
    gt_p, sub_p = str(tmp_path / 'gt.json'), str(tmp_path / 'sub.json')
    json.dump(gt, open(gt_p, 'w'))
    json.dump(sub, open(sub_p, 'w'))

    def run():
        ev = ANETcaptions(ground_truth_filenames=[gt_p],
                          prediction_filename=sub_p, tious=[0.5, 0.7])
        ev.evaluate()
        return ev.scores

    s1 = run()
    _random.seed(12345)     # perturb global RNG: must not matter
    s2 = run()
    assert s1 == s2


def test_meteor_jar_stdio_protocol(tmp_path, monkeypatch):
    '''Exercise _compute_meteor_java against a scripted fake `java` that
    honors the meteor-1.5 -stdio SCORE/EVAL framing: validates the line
    protocol, the persistent-process reuse, and the kill-and-restart
    behavior on a protocol error.'''
    import os
    import stat
    from bmt_tpu.evaluation import meteor as M

    fake = tmp_path / 'java'
    fake.write_text('''#!/usr/bin/env python3
import sys
# argv mirrors: java -jar -Xmx2G <jar> - - -stdio -l en -norm
assert '-stdio' in sys.argv, sys.argv
stats = []
for line in sys.stdin:
    parts = line.rstrip('\\n').split(' ||| ')
    if parts[0] == 'SCORE':
        hypo = parts[-1]
        if 'DIE' in hypo:
            sys.exit(3)                      # simulated JVM crash
        # one stats line per SCORE (the real jar emits sufficient stats)
        s = len(hypo.split())
        stats.append(s)
        print(s)
        sys.stdout.flush()
    elif parts[0] == 'EVAL':
        vals = [float(x) / 100.0 for x in parts[1:]]
        for v in vals:
            print(v)
        print(sum(vals) / len(vals))
        sys.stdout.flush()
        stats = []
''')
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    jar = tmp_path / 'meteor-1.5.jar'
    jar.write_text('not a real jar')
    monkeypatch.setenv('PATH', f'{tmp_path}{os.pathsep}' +
                       os.environ['PATH'])
    monkeypatch.setenv('METEOR_JAR', str(jar))
    M._kill_java_proc()                  # fresh proc under the fake PATH
    try:
        gts = {'a': ['the man runs'], 'b': ['a dog jumps high']}
        res = {'a': ['the man runs'], 'b': ['dog jumps']}
        avg, per_key = M.compute_meteor(gts, res)
        # fake scores: word counts / 100, keys in sorted order
        assert per_key == [0.03, 0.02]
        assert abs(avg - 0.025) < 1e-12
        proc1 = M._java_proc
        assert proc1 is not None and proc1.poll() is None

        # the process PERSISTS across calls (one JVM per session)
        avg2, _ = M.compute_meteor(gts, res)
        assert M._java_proc is proc1
        assert abs(avg2 - avg) < 1e-12

        # a protocol error kills the proc (no leak); next call restarts
        with pytest.raises(Exception):
            M.compute_meteor({'x': ['ref']}, {'x': ['DIE hard']})
        assert M._java_proc is None
        avg3, _ = M.compute_meteor(gts, res)
        assert abs(avg3 - avg) < 1e-12
        assert M._java_proc is not proc1
    finally:
        M._kill_java_proc()


def test_meteor_parallel_equals_serial(monkeypatch):
    '''Process-parallel scoring (forked workers over key chunks) must be
    bit-identical to serial scoring — same per-key list order and the
    same aggregate score.'''
    import random as _random
    from bmt_tpu.evaluation import meteor as M

    _random.seed(3)
    words = 'man woman dog runs jumps plays park fast the a is and'.split()

    def sent(n):
        return ' '.join(_random.choice(words) for _ in range(n))

    N = 300
    gts = {i: [sent(_random.randint(6, 14))] for i in range(N)}
    res = {i: [sent(_random.randint(4, 10))] for i in range(N)}

    # force the pure-Python scorer: with the native engine enabled the
    # pool is (deliberately) bypassed, and this test is about the pool
    monkeypatch.setenv('BMT_METEOR_NATIVE', '0')
    monkeypatch.setenv('BMT_METEOR_PROCS', '1')
    avg_s, per_s = M.compute_meteor(gts, res)
    monkeypatch.setenv('BMT_METEOR_PROCS', '4')
    monkeypatch.setattr(M, '_PARALLEL_MIN_KEYS', 100)
    avg_p, per_p = M.compute_meteor(gts, res)
    assert avg_p == avg_s
    assert per_p == per_s


def test_meteor_synonym_stage_activates(tmp_path, monkeypatch):
    '''The METEOR_SYNONYMS-driven synonym stage: words sharing a synset id
    match at stage weight 0.8 — between exact (1.0) and nothing. The
    module loads the table at import, so the test swaps the module-level
    dict the way the env load would have produced it.'''
    import json as _json
    from bmt_tpu.evaluation import meteor as M

    syn_path = tmp_path / 'synonyms.json'
    _json.dump({'dog': ['n.canid.1'], 'canine': ['n.canid.1'],
                'cat': ['n.felid.1']}, open(syn_path, 'w'))
    # the stage activates lazily from the env — even AFTER the module
    # was imported (like METEOR_JAR)
    monkeypatch.delenv('METEOR_SYNONYMS', raising=False)
    without = M.meteor_pair('the canine runs', 'the dog runs')
    monkeypatch.setenv('METEOR_SYNONYMS', str(syn_path))
    with_syn = M.meteor_pair('the canine runs', 'the dog runs')
    exact = M.meteor_pair('the dog runs', 'the dog runs')
    # synonym match raises the score but stays below an exact match
    assert with_syn > without
    assert exact > with_syn
    # non-synonymous words (disjoint synsets) do NOT match
    disjoint = M.meteor_pair('the cat runs', 'the dog runs')
    assert disjoint == without

    # env unset again -> stage deactivates (no import-time freeze)
    monkeypatch.delenv('METEOR_SYNONYMS')
    assert M.meteor_pair('the canine runs', 'the dog runs') == without


def test_meteor_corpus_scores_matches_per_video_calls(monkeypatch):
    '''The batched video-level entry (the eval's hot path) must be
    bit-identical to per-video compute_meteor calls, parallel or serial,
    including empty videos (score 0.0).'''
    import random as _random
    from bmt_tpu.evaluation import meteor as M

    # pin the pure-Python scorer so the PROCS=4 branch exercises the
    # process pool (native enabled would bypass it); native==python
    # equivalence has its own differential tests below
    monkeypatch.setenv('BMT_METEOR_NATIVE', '0')
    _random.seed(11)
    words = 'man woman dog runs jumps plays park the a is and'.split()

    def sent(n):
        return ' '.join(_random.choice(words) for _ in range(n))

    tasks, k = {}, 0
    for v in range(40):
        gts, res = {}, {}
        for _ in range(_random.randint(1, 5)):
            gts[k] = [sent(_random.randint(6, 14))]
            res[k] = [sent(_random.randint(4, 10))]
            k += 1
        tasks[f'v{v}'] = (gts, res)
    tasks['v_empty'] = ({}, {})

    expected = {vid: (M.compute_meteor(g, r)[0] if g else 0.0)
                for vid, (g, r) in tasks.items()}

    monkeypatch.setenv('BMT_METEOR_PROCS', '1')
    serial = M.compute_meteor_corpus_scores(tasks)
    assert serial == expected

    monkeypatch.setenv('BMT_METEOR_PROCS', '4')
    monkeypatch.setattr(M, '_PARALLEL_MIN_KEYS', 10)
    parallel = M.compute_meteor_corpus_scores(tasks)
    assert parallel == expected


# ---------------------------------------------------------------------------
# Native METEOR alignment engine (native/meteor_align.cc)
# ---------------------------------------------------------------------------

def _native_available():
    from bmt_tpu.evaluation import meteor_native
    return meteor_native.get_lib() is not None


def test_meteor_native_engine_builds():
    '''g++ is part of this environment — the native engine must build and
    load (a skip here would hide a build regression).'''
    assert _native_available()


def test_meteor_native_matches_python_exhaustive(monkeypatch):
    '''The batched native stats must equal the pure-Python best_ref_stats
    EXACTLY (dataclass equality: every stage count, matches, chunks) on
    randomized corpora that stress repeated words (beam tie-breaking),
    stem-only matches, function words, empty hypotheses and empty
    reference lists.'''
    import random as _random
    from bmt_tpu.evaluation import meteor as M

    _random.seed(5)
    vocab = ('man woman person runs running jumps jumped walks walking '
             'throws threw ball field the a is are on in over and').split()

    def sent(lo, hi):
        return ' '.join(_random.choice(vocab)
                        for _ in range(_random.randint(lo, hi)))

    items = [(sent(0, 22), [sent(1, 25)
                            for _ in range(_random.randint(1, 3))])
             for _ in range(500)]
    items += [('', ['a man runs']), ('a man runs', [])]

    monkeypatch.setenv('BMT_METEOR_NATIVE', '1')
    native = M._batch_best_ref_stats(items)
    monkeypatch.setenv('BMT_METEOR_NATIVE', '0')
    python = [M.best_ref_stats(h, refs) for h, refs in items]
    assert native == python


def test_meteor_native_synonyms_match_python(tmp_path, monkeypatch):
    '''Synonym-stage candidates (synset-id intersection) go through the
    native engine too, identically to the Python stage.'''
    import json as _json
    from bmt_tpu.evaluation import meteor as M

    syn_path = tmp_path / 'synonyms.json'
    _json.dump({'dog': ['n.canid.1', 'n.pet.2'], 'canine': ['n.canid.1'],
                'cat': ['n.felid.1', 'n.pet.2'], 'runs': ['v.move.1'],
                'sprints': ['v.move.1']}, open(syn_path, 'w'))
    monkeypatch.setenv('METEOR_SYNONYMS', str(syn_path))
    items = [('the canine sprints', ['the dog runs']),
             ('a cat sat', ['the dog runs', 'a dog sat']),
             ('dog cat dog', ['canine cat canine'])]
    monkeypatch.setenv('BMT_METEOR_NATIVE', '1')
    native = M._batch_best_ref_stats(items)
    monkeypatch.setenv('BMT_METEOR_NATIVE', '0')
    python = [M.best_ref_stats(h, refs) for h, refs in items]
    assert native == python
    # the synonym stage actually fired (stage-2 counts nonzero)
    assert sum(native[0].tmc) and native[0].tmc[2] > 0


def test_meteor_native_long_ref_falls_back_in_batch(monkeypatch):
    '''References beyond the native 128-token bitset cap are aligned by
    the Python fallback PER PAIR — the rest of the batch still goes
    native, and results equal the pure-Python path.'''
    from bmt_tpu.evaluation import meteor as M

    long_ref = ' '.join(['word'] * 140)
    items = [('a man runs', ['a man runs fast']),
             ('word word other', [long_ref]),
             ('the dog jumps', ['the dog jumps'])]
    monkeypatch.setenv('BMT_METEOR_NATIVE', '1')
    native = M._batch_best_ref_stats(items)
    monkeypatch.setenv('BMT_METEOR_NATIVE', '0')
    python = [M.best_ref_stats(h, refs) for h, refs in items]
    assert native == python


def test_meteor_native_disable_env(monkeypatch):
    from bmt_tpu.evaluation import meteor_native
    monkeypatch.setenv('BMT_METEOR_NATIVE', '0')
    assert not meteor_native.enabled()
    monkeypatch.delenv('BMT_METEOR_NATIVE')
    assert meteor_native.enabled() == (_native_available())


def test_meteor_native_threads_deterministic(monkeypatch):
    '''Thread-count invariance: pairs are independent, so 1 thread and
    many threads must produce identical statistics.'''
    import random as _random
    from bmt_tpu.evaluation import meteor as M

    _random.seed(9)
    words = 'man dog runs jumps the a is park fast and'.split()

    def sent(n):
        return ' '.join(_random.choice(words) for _ in range(n))

    items = [(sent(_random.randint(4, 12)), [sent(_random.randint(5, 14))])
             for _ in range(200)]
    monkeypatch.setenv('BMT_METEOR_NATIVE', '1')
    monkeypatch.setenv('BMT_METEOR_THREADS', '1')
    one = M._batch_best_ref_stats(items)
    monkeypatch.setenv('BMT_METEOR_THREADS', '8')
    eight = M._batch_best_ref_stats(items)
    assert one == eight
