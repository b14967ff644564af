'''Host-side English tokenizer.

The reference tokenizes captions with spaCy 2.0's 'en' tokenizer via
torchtext (reference: datasets/captioning_dataset.py:13-20). spaCy is not a
dependency of this framework; this module implements the relevant subset of
spaCy's rule-based English tokenization in pure Python:

- whitespace split, then prefix/suffix punctuation stripping,
- English contraction exceptions ("don't" -> ["do", "n't"], "it's" ->
  ["it", "'s"], ...),
- infix splitting on hyphens/slashes/commas between alphanumerics.

If spaCy is importable it is used instead (exact parity with the reference
vocabulary); otherwise this approximation applies. Lowercasing happens in the
caller (the reference field sets lower=True).
'''
from __future__ import annotations

import re
from functools import lru_cache
from typing import List

_PREFIXES = tuple('([{"\'$£€¿¡«‘“,;')
_SUFFIXES = tuple(',.!?:;)]}"\'%»…’”')

# suffix contraction pieces split off the token end (spaCy exceptions subset)
_CONTRACTION_SUFFIXES = ("n't", "'s", "'S", "'m", "'M", "'re", "'RE", "'ve",
                         "'VE", "'ll", "'LL", "'d", "'D", "N'T")

_SPECIAL_CASES = {
    "cannot": ["can", "not"],
    "gonna": ["gon", "na"],
    "gotta": ["got", "ta"],
    "wanna": ["wan", "na"],
    "lemme": ["lem", "me"],
    "gimme": ["gim", "me"],
    "''": ["''"],
    "won't": ["wo", "n't"],
    "Won't": ["Wo", "n't"],
    "can't": ["ca", "n't"],
    "Can't": ["Ca", "n't"],
    "ain't": ["ai", "n't"],
    "aint": ["ai", "nt"],
    "shan't": ["sha", "n't"],
    "let's": ["let", "'s"],
    "Let's": ["Let", "'s"],
    "'em": ["'em"],
    "o'clock": ["o'clock"],
    "O'clock": ["O'clock"],
}

_INFIX_RE = re.compile(r"(?<=[0-9A-Za-z])([\-—–/,])(?=[0-9A-Za-z])")
# quotes and brackets split unconditionally wherever they appear mid-token
_HARD_INFIX_RE = re.compile(r'(["“”()\[\]{}])')
_URL_RE = re.compile(r"^(?:https?://|www\.)\S+$")
_NUM_RE = re.compile(r"^[0-9][0-9.,:]*[0-9]$|^[0-9]$")


def _split_token(tok: str) -> List[str]:
    if not tok:
        return []
    if tok in _SPECIAL_CASES:
        return list(_SPECIAL_CASES[tok])
    if _URL_RE.match(tok) or _NUM_RE.match(tok):
        return [tok]

    # prefixes
    for p in _PREFIXES:
        if len(tok) > 1 and tok.startswith(p):
            return [p] + _split_token(tok[1:])

    # contraction suffixes before generic suffixes
    for c in _CONTRACTION_SUFFIXES:
        if len(tok) > len(c) and tok.endswith(c):
            head = tok[:-len(c)]
            if head and head[-1].isalpha():
                return _split_token(head) + [c]

    # suffixes
    for s in _SUFFIXES:
        if len(tok) > 1 and tok.endswith(s):
            # keep decimal points inside numbers
            if s == '.' and _NUM_RE.match(tok):
                return [tok]
            return _split_token(tok[:-1]) + [s]

    # quotes/brackets split anywhere inside a token
    m = _HARD_INFIX_RE.search(tok)
    if m:
        i = m.start(1)
        return (_split_token(tok[:i]) + [tok[i]]
                + _split_token(tok[i + 1:]))

    # infix punctuation between alphanumerics
    m = _INFIX_RE.search(tok)
    if m:
        i = m.start(1)
        return _split_token(tok[:i]) + [tok[i]] + _split_token(tok[i + 1:])
    return [tok]


def _rule_tokenize(text: str) -> List[str]:
    out: List[str] = []
    for tok in text.split():
        out.extend(_split_token(tok))
    return out


@lru_cache(maxsize=1)
def _spacy_tokenizer():
    try:
        import spacy
        try:
            nlp = spacy.load('en')
        except Exception:
            nlp = spacy.blank('en')
        return nlp.tokenizer
    except Exception:
        return None


def tokenize_en(text: str) -> List[str]:
    '''Tokenize an English caption. Uses spaCy when available (reference
    parity), pure-Python rules otherwise.'''
    tok = _spacy_tokenizer()
    if tok is not None:
        return [t.text for t in tok(text)]
    return _rule_tokenize(text)
