'''PTB-style caption tokenizer (pure Python).

The reference scores captions through pycocoevalcap's PTBTokenizer, a Java
subprocess wrapping Stanford CoreNLP (reference: evaluation/evaluate.py:17,
231-232). This module reproduces its observable behaviour in Python:
lowercase, Penn-Treebank tokenization (contraction splitting, punctuation
separation), then removal of punctuation tokens from the fixed PTB list.
'''
from __future__ import annotations

import re
from typing import Dict, List

# pycocoevalcap/tokenizer/ptbtokenizer.py PUNCTUATIONS list
PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]
_PUNCT_SET = set(PUNCTUATIONS)

# Penn Treebank tokenization rules (sed-script equivalents)
_RULES = [
    (re.compile(r'^"'), r'`` '),
    (re.compile(r'([ (\[{<])"'), r'\1 `` '),
    (re.compile(r'\.\.\.'), r' ... '),
    (re.compile(r'[,;:@#$%&]'), lambda m: f' {m.group(0)} '),
    # final period (not part of abbreviation)
    (re.compile(r'([^.])(\.)([\]\)}>"\']*)\s*$'), r'\1 \2\3 '),
    (re.compile(r'[?!]'), lambda m: f' {m.group(0)} '),
    # CoreNLP ptb3Escaping: brackets become -LRB-/-RRB-/... tokens. After
    # the Java tokenizer's -lowerCase these are '-lrb-' etc., which do NOT
    # match pycocoevalcap's uppercase PUNCTUATIONS entries — so bracket
    # tokens are KEPT in normalized form (a reference quirk, reproduced).
    (re.compile(r'\('), r' -LRB- '),
    (re.compile(r'\)'), r' -RRB- '),
    (re.compile(r'\['), r' -LSB- '),
    (re.compile(r'\]'), r' -RSB- '),
    (re.compile(r'\{'), r' -LCB- '),
    (re.compile(r'\}'), r' -RCB- '),
    (re.compile(r'[<>]'), lambda m: f' {m.group(0)} '),
    (re.compile(r'--'), r' -- '),
    (re.compile(r'"'), r" '' "),
    (re.compile(r"([^'])' "), r"\1 ' "),
    # contractions
    (re.compile(r"'([sSmMdD]) "), r" '\1 "),
    (re.compile(r"('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r' \1 '),
    (re.compile(r'\b(can)(not)\b', re.IGNORECASE), r'\1 \2'),
    (re.compile(r"\b(d')(ye)\b", re.IGNORECASE), r'\1 \2'),
    (re.compile(r'\b(gon)(na)\b', re.IGNORECASE), r'\1 \2'),
    (re.compile(r'\b(got)(ta)\b', re.IGNORECASE), r'\1 \2'),
    (re.compile(r'\b(lem)(me)\b', re.IGNORECASE), r'\1 \2'),
    (re.compile(r"\b(more'n)\b", re.IGNORECASE), r"more 'n"),
    (re.compile(r'\b(wan)(na) ', re.IGNORECASE), r'\1 \2 '),
]


def ptb_tokenize_sentence(text: str) -> List[str]:
    text = ' ' + text + ' '
    for pattern, repl in _RULES:
        text = pattern.sub(repl, text)
    tokens = text.lower().split()
    return [t for t in tokens if t not in _PUNCT_SET]


def ptb_tokenize(captions_for_image: Dict) -> Dict:
    '''dict[key -> list[{'caption': str}]] -> dict[key -> list[str]],
    matching the pycocoevalcap tokenizer interface: each caption becomes a
    single space-joined token string.'''
    out = {}
    for k, caps in captions_for_image.items():
        out[k] = [' '.join(ptb_tokenize_sentence(c['caption'])) for c in caps]
    return out
