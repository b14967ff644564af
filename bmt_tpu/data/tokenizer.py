'''Host-side English tokenizer — spaCy 2.0.12 reconstruction.

The reference tokenizes captions with spaCy 2.0.12's 'en' tokenizer via
torchtext (reference: datasets/captioning_dataset.py:13-20; version pin:
conda_env.yml:66). spaCy is not a dependency of this framework; this module
re-implements spaCy 2.0.12's rule-based tokenizer algorithm and its English
rule data in pure Python:

- whitespace split, then per-substring: exception-table lookup, URL
  token_match, iterative prefix/suffix stripping (re-checking exceptions
  after each strip), and finally infix splitting — the same control flow
  as spacy.tokenizer.Tokenizer;
- prefix / suffix / infix regexes transcribed from spaCy 2.0.12
  lang/punctuation.py + char_classes.py. The alpha'/'alpha infix IS
  included: rebuilding the vocabulary from the reference train.csv with
  it yields exactly the checkpoint's 10172 entries, without it 10179 —
  so the reference environment's tokenizer split those slashes
  (empirically settled; see tests/test_data.py);
- the English tokenizer-exception table (contractions incl. apostrophe-less
  variants with the ambiguity exclude-list, abbreviations, emoticons)
  rebuilt programmatically like lang/en/tokenizer_exceptions.py.

If spaCy is importable it is used instead (exact parity with the reference
vocabulary); otherwise this reconstruction applies. Lowercasing happens in
the caller (the reference torchtext field sets lower=True, applied AFTER
tokenization).
'''
from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, List

# ---------------------------------------------------------------------------
# char classes (spaCy 2.0.12 lang/char_classes.py, latin subset)
# ---------------------------------------------------------------------------

_ALPHA = r'a-zA-ZÀ-ɏ'  # latin letters incl. accented
_ALPHA_LOWER = r'a-zß-ÿāăąćĉċ'
_ALPHA_UPPER = r'A-ZÀ-Þ'

_LIST_PUNCT = ['…', ',', ':', ';', r'\!', r'\?', '¿', '¡', r'\(', r'\)',
               r'\[', r'\]', r'\{', r'\}', '<', '>', '_', '#', r'\*', '&']
_LIST_ELLIPSES = [r'\.\.+', '…']
_LIST_QUOTES = ["'", '"', '”', '“', '``', '`', '‘', '´', '’', '‚', '„',
                '»', '«', '「', '」', '『', '』', '（', '）', '〔', '〕',
                '【', '】', '《', '》', '〈', '〉']
_LIST_CURRENCY = [r'\$', '£', '€', '¥', '฿', r'US\$', r'C\$', r'A\$']
_LIST_ICONS = [r'[☀-➿\U0001F300-\U0001FAFF]']
_QUOTES_CC = '\'"”“`‘´’‚„»«'
_CURRENCY_CC = r'\$£€¥฿'
_UNITS = ('km km² km³ m m² m³ dm dm² dm³ cm cm² cm³ mm mm² mm³ ha µm nm yd '
          'in ft kg g mg µg t lb oz m/s km/h kmh mph hPa Pa mbar mb MB kb '
          'KB gb GB tb TB T G M K %').split()
_HYPHENS = ['-', '–', '—', '--', '---', '——']

# ---------------------------------------------------------------------------
# prefix / suffix / infix rules (spaCy 2.0.12 lang/punctuation.py)
# ---------------------------------------------------------------------------

_PREFIX_PIECES = (['§', '%', '=', r'\+'] + _LIST_PUNCT + _LIST_ELLIPSES
                  + _LIST_QUOTES + _LIST_CURRENCY + _LIST_ICONS)

_SUFFIX_PIECES = (
    _LIST_PUNCT + _LIST_ELLIPSES + _LIST_QUOTES + _LIST_ICONS
    + ["'s", "'S", '’s', '’S']
    + [r'(?<=[0-9])\+',
       r'(?<=°[FfCcKk])\.',
       r'(?<=[0-9])(?:[{c}])'.format(c=_CURRENCY_CC),
       r'(?<=[0-9])(?:{u})'.format(
           u='|'.join(sorted((re.escape(u) for u in _UNITS), key=len,
                             reverse=True))),
       r'(?<=[0-9{al}%²\-\)\]\+{q}])\.'.format(al=_ALPHA_LOWER, q=_QUOTES_CC),
       r'(?<=[{au}][{au}])\.'.format(au=_ALPHA_UPPER)]
)

_INFIX_PIECES = (
    _LIST_ELLIPSES + _LIST_ICONS
    + [r'(?<=[0-9])[+\-\*^](?=[0-9-])',
       r'(?<=[{al}])\.(?=[{au}])'.format(al=_ALPHA_LOWER, au=_ALPHA_UPPER),
       r'(?<=[{a}]),(?=[{a}])'.format(a=_ALPHA),
       r'(?<=[{a}])[?";:=,.]*(?:{h})(?=[{a}])'.format(
           a=_ALPHA, h='|'.join(re.escape(h) for h in
                                sorted(_HYPHENS, key=len, reverse=True))),
       r'(?<=[{a}"])[:<>=/](?=[{a}])'.format(a=_ALPHA)]
)

_PREFIX_RE = re.compile('|'.join(f'^(?:{p})' for p in _PREFIX_PIECES))
_SUFFIX_RE = re.compile('|'.join(f'(?:{s})$' for s in _SUFFIX_PIECES))
_INFIX_RE = re.compile('|'.join(_INFIX_PIECES))

# spaCy 2.0.12 URL token_match (lang/tokenizer_exceptions.py URL_PATTERN,
# simplified to the forms that occur in natural captions: scheme:..., www.,
# user@host). NOTE the scheme arm accepts any '<3-9 letters>:<host-chars>'
# WITHOUT requiring '://' — deliberately: exactly one train.csv token takes
# this path ('for:copyright', 1 occurrence) and keeping it whole is what
# reproduces the reference checkpoint's exact 10172-entry vocabulary
# (golden-tested); tightening the pattern would split it and break the
# count parity this tokenizer exists to provide.
_URL_RE = re.compile(
    r'^(?:[A-Za-z]{3,9}:(?://)?(?:[-;:&=+$,\w]+@)?[A-Za-z0-9.\-]+'
    r'|(?:www\.|[-;:&=+$,\w]+@)[A-Za-z0-9.\-]+)'
    r'(?:/[+~%/.\w\-_]*)?\??[-+=&;%@.\w_]*#?\w*$')


# ---------------------------------------------------------------------------
# English exception table (spaCy 2.0.12 lang/en/tokenizer_exceptions.py)
# ---------------------------------------------------------------------------

def _build_exceptions() -> Dict[str, List[str]]:
    exc: Dict[str, List[str]] = {}

    def add(orth: str, pieces: List[str]):
        exc[orth] = pieces

    def variants(base: str):
        return [base, base.title()]

    # pronoun "i" + 'm / 'ma
    for orth in variants('i'):
        add(orth + "'m", [orth, "'m"])
        add(orth + 'm', [orth, 'm'])
        add(orth + "'ma", [orth, "'m", 'a'])
        add(orth + 'ma', [orth, 'm', 'a'])

    prons = ['i', 'you', 'he', 'she', 'it', 'we', 'they']
    for pron in prons:
        for orth in variants(pron):
            add(orth + "'ll", [orth, "'ll"])
            add(orth + 'll', [orth, 'll'])
            add(orth + "'ll've", [orth, "'ll", "'ve"])
            add(orth + 'llve', [orth, 'll', 've'])
            add(orth + "'d", [orth, "'d"])
            add(orth + 'd', [orth, 'd'])
            add(orth + "'d've", [orth, "'d", "'ve"])
            add(orth + 'dve', [orth, 'd', 've'])
    for pron in ['i', 'you', 'we', 'they']:
        for orth in variants(pron):
            add(orth + "'ve", [orth, "'ve"])
            add(orth + 've', [orth, 've'])
    for pron in ['you', 'we', 'they']:
        for orth in variants(pron):
            add(orth + "'re", [orth, "'re"])
            add(orth + 're', [orth, 're'])
    for pron in ['he', 'she', 'it']:
        for orth in variants(pron):
            add(orth + "'s", [orth, "'s"])
            add(orth + 's', [orth, 's'])

    # W-words / "there" / "that"
    for word in ['who', 'what', 'when', 'where', 'why', 'how', 'there',
                 'that']:
        for orth in variants(word):
            add(orth + "'s", [orth, "'s"])
            add(orth + 's', [orth, 's'])
            add(orth + "'ll", [orth, "'ll"])
            add(orth + 'll', [orth, 'll'])
            add(orth + "'d", [orth, "'d"])
            add(orth + 'd', [orth, 'd'])
            add(orth + "'re", [orth, "'re"])
            add(orth + 're', [orth, 're'])
            add(orth + "'ve", [orth, "'ve"])
            add(orth + 've', [orth, 've'])

    # verbs + n't
    for verb in ['ca', 'could', 'do', 'does', 'did', 'had', 'may', 'might',
                 'must', 'need', 'ought', 'sha', 'should', 'wo', 'would']:
        for orth in variants(verb):
            add(orth + "n't", [orth, "n't"])
            add(orth + 'nt', [orth, 'nt'])
            add(orth + "n't've", [orth, "n't", "'ve"])
            add(orth + 'ntve', [orth, 'nt', 've'])
    for verb in ['could', 'might', 'must', 'should', 'would']:
        for orth in variants(verb):
            add(orth + "'ve", [orth, "'ve"])
            add(orth + 've', [orth, 've'])
    for verb in ['ai', 'are', 'is', 'was', 'were', 'have', 'has', 'dare']:
        for orth in variants(verb):
            add(orth + "n't", [orth, "n't"])
            add(orth + 'nt', [orth, 'nt'])

    # misc contractions
    misc = {
        "let's": ['let', "'s"], "Let's": ['Let', "'s"],
        "y'all": ["y'", 'all'], "yall": ['y', 'all'],
        "ma'am": ["ma'am"], "o'clock": ["o'clock"],
        "O'clock": ["O'clock"], "lovin'": ['lovin', "'"],
        "havin'": ['havin', "'"], "doin'": ['doin', "'"],
        "goin'": ['goin', "'"], "nothin'": ['nothin', "'"],
        "somethin'": ['somethin', "'"], "ol'": ['ol', "'"],
        "'cause": ["'cause"], "'Cause": ["'Cause"],
        "and/or": ['and/or'], "w/o": ['w/o'],
        "'S": ["'S"], "'s": ["'s"], '’S': ['’S'], '’s': ['’s'],
        "'re": ["'re"], "''": ["''"], "'em": ["'em"],
        'cannot': ['can', 'not'], 'Cannot': ['Can', 'not'],
        'gonna': ['gon', 'na'], 'Gonna': ['Gon', 'na'],
        'gotta': ['got', 'ta'], 'Gotta': ['Got', 'ta'],
        'wanna': ['wan', 'na'], 'Wanna': ['Wan', 'na'],
        'lemme': ['lem', 'me'], 'Lemme': ['Lem', 'me'],
    }
    exc.update(misc)

    # abbreviations kept whole (trailing-period exceptions)
    for orth in ['a.m.', 'p.m.', 'Adm.', 'Bros.', 'co.', 'Co.', 'Corp.',
                 'D.C.', 'Dr.', 'e.g.', 'E.g.', 'E.G.', 'Gen.', 'Gov.',
                 'i.e.', 'I.e.', 'I.E.', 'Inc.', 'Jr.', 'Ltd.', 'Md.',
                 'Messrs.', 'Mo.', 'Mont.', 'Mr.', 'Mrs.', 'Ms.', 'Ph.D.',
                 'Rep.', 'Rev.', 'Sen.', 'St.', 'vs.',
                 'Jan.', 'Feb.', 'Mar.', 'Apr.', 'Jun.', 'Jul.', 'Aug.',
                 'Sep.', 'Sept.', 'Oct.', 'Nov.', 'Dec.']:
        add(orth, [orth])

    # base exceptions: single letter + period, emoticons (subset of spaCy's
    # lang/tokenizer_exceptions.py BASE_EXCEPTIONS)
    for c in 'abcdefghijklmnopqrstuvwxyz':
        add(c + '.', [c + '.'])
    for emo in (":) :( :-) :-( :'( :') :P :p :O :o :D :-D =) (= (: ): <3 "
                "</3 :/ :-/ :| :-| ;) ;-) ;( ;-( -_- o.O O.o o_O 0_0 xD XD "
                ":0 8) 8-) V.v.V").split(' '):
        add(emo, [emo])
    add('C++', ['C++'])

    # ambiguity exclude-list (spaCy: real words shadowed by contractions)
    for string in ['Ill', 'ill', 'Its', 'its', 'Hell', 'hell', 'Shell',
                   'shell', 'Shed', 'shed', 'were', 'Were', 'Well', 'well',
                   'Whore', 'whore']:
        exc.pop(string, None)
    return exc


_EXCEPTIONS = _build_exceptions()


# ---------------------------------------------------------------------------
# tokenizer algorithm (spacy.tokenizer.Tokenizer control flow)
# ---------------------------------------------------------------------------

def _tokenize_substring(sub: str) -> List[str]:
    prefixes: List[str] = []
    suffixes: List[str] = []
    token_match = False
    while sub:
        if sub in _EXCEPTIONS:
            return prefixes + list(_EXCEPTIONS[sub]) + suffixes[::-1]
        if _URL_RE.match(sub):
            token_match = True  # attach whole, no infix splitting
            break
        m = _PREFIX_RE.match(sub)
        if m and m.end() > 0:
            if m.end() == len(sub):
                prefixes.append(sub)
                sub = ''
                break
            prefixes.append(sub[:m.end()])
            sub = sub[m.end():]
            continue
        m = _SUFFIX_RE.search(sub)
        if m and m.end() == len(sub) and m.start() > 0:
            suffixes.append(sub[m.start():])
            sub = sub[:m.start()]
            continue
        break
    middle: List[str] = []

    def emit(piece: str):
        # spaCy seeds its cache with the special cases, so exception
        # lookups also apply to infix-split pieces
        middle.extend(_EXCEPTIONS.get(piece, [piece]))

    if token_match:
        middle.append(sub)
        sub = ''
    if sub:
        pos = 0
        for m in _INFIX_RE.finditer(sub):
            if m.start() == m.end():
                continue
            if m.start() > pos:
                emit(sub[pos:m.start()])
            middle.append(m.group(0))
            pos = m.end()
        if pos < len(sub):
            emit(sub[pos:])
    return prefixes + middle + suffixes[::-1]


def _rule_tokenize(text: str) -> List[str]:
    out: List[str] = []
    for sub in text.split():
        out.extend(_tokenize_substring(sub))
    return out


@lru_cache(maxsize=1)
def _spacy_tokenizer():
    '''Real spaCy, but ONLY the reference's 2.0.x line: a modern spaCy has
    different English rules, and silently preferring it would rebuild a
    vocabulary that no longer matches the validated 10172-entry one (token
    ids would then disagree between hosts with and without spaCy).'''
    try:
        import spacy
        if not getattr(spacy, '__version__', '').startswith('2.0'):
            return None
        try:
            nlp = spacy.load('en')
        except Exception:
            nlp = spacy.blank('en')
        return nlp.tokenizer
    except Exception:
        return None


def tokenize_en(text: str) -> List[str]:
    '''Tokenize an English caption. Uses spaCy when available (reference
    parity), the pure-Python spaCy-2.0.12 reconstruction otherwise.'''
    tok = _spacy_tokenizer()
    if tok is not None:
        return [t.text for t in tok(text)]
    return _rule_tokenize(text)
