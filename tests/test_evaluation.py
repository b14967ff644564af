'''Evaluation stack tests: scorer sanity + golden-file validation against the
reference's published epoch-26 prediction dumps.

Golden anchor: scoring the reference's captioning_results_val_1_e26.json with
this framework's scorers reproduces the README-published BLEU (B@3 4.63,
B@4 1.99 averaged over val_1/val_2) — our val_1 numbers are 4.68/2.07,
val_2 4.57/1.91, avg 4.62/1.99. METEOR here is the pure-Python classic
implementation (no Java/WordNet) and reads higher than the Java jar; all
framework-internal comparisons use this scorer consistently.
'''
import os

import pytest

from bmt_tpu.evaluation.bleu import compute_bleu
from bmt_tpu.evaluation.cider import compute_cider
from bmt_tpu.evaluation.meteor import compute_meteor, meteor_pair
from bmt_tpu.evaluation.ptb_tokenizer import ptb_tokenize_sentence
from bmt_tpu.evaluation.rouge import compute_rouge
from bmt_tpu.evaluation.stemmer import porter_stem

REF_DATA = '/root/reference/data'
REF_RESULTS = '/root/reference/results'


def test_ptb_tokenizer():
    assert ptb_tokenize_sentence('A man is playing guitar.') == \
        ['a', 'man', 'is', 'playing', 'guitar']
    assert ptb_tokenize_sentence("He doesn't stop, he keeps going!") == \
        ['he', 'does', "n't", 'stop', 'he', 'keeps', 'going']
    # punctuation tokens dropped per the PTB punctuation list
    assert ptb_tokenize_sentence('Wait -- what?') == ['wait', 'what']


def test_porter_stemmer():
    # note: classic Porter (not Porter2): step 1c maps trailing y -> i,
    # so playing/played both stem to 'plai' (what METEOR matching needs)
    cases = {'playing': 'plai', 'played': 'plai', 'caresses': 'caress',
             'ponies': 'poni', 'running': 'run', 'agreed': 'agre',
             'troubled': 'troubl', 'relational': 'relat', 'hopeful': 'hope'}
    for word, stem in cases.items():
        assert porter_stem(word) == stem, (word, porter_stem(word))


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
    # consistent-scorer METEOR anchor for cross-system comparisons
    assert 0.15 < avg['METEOR'] < 0.25
