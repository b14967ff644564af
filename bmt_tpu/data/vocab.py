'''Vocabulary + GloVe loading (torchtext replacement).

Replicates torchtext 0.3.1 vocabulary construction as used by the reference
(reference: datasets/captioning_dataset.py:18-41):

- specials first, in order ['<unk>', '<blank>', '<s>', '</s>']
  (so pad_idx = 1, start_idx = 2, end_idx = 3),
- then corpus words sorted alphabetically, stably re-sorted by frequency
  descending (torchtext's exact two-pass sort -> frequency ties are
  alphabetical ascending),
- min_freq filtering (default 1),
- GloVe vectors aligned to the vocab with zero vectors for OOV words
  (torchtext's default unk_init).
'''
from __future__ import annotations

import csv
import hashlib
import json
import os
from collections import Counter
from typing import Dict, List, Optional

import numpy as np

from bmt_tpu.data.tokenizer import tokenize_en

UNK_TOKEN = '<unk>'


class Vocab:
    def __init__(self, itos: List[str], freqs: Optional[Counter] = None):
        self.itos = list(itos)
        self.stoi: Dict[str, int] = {s: i for i, s in enumerate(self.itos)}
        self.freqs = freqs or Counter()
        self.unk_index = self.stoi.get(UNK_TOKEN, 0)
        self.vectors: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.itos)

    def __getitem__(self, token: str) -> int:
        return self.stoi.get(token, self.unk_index)

    def encode(self, tokens: List[str]) -> List[int]:
        return [self[t] for t in tokens]

    def decode(self, ids) -> List[str]:
        return [self.itos[int(i)] for i in ids]

    def save(self, path: str):
        with open(path, 'w') as f:
            json.dump({'itos': self.itos}, f)

    @classmethod
    def load(cls, path: str) -> 'Vocab':
        with open(path) as f:
            return cls(json.load(f)['itos'])


def build_vocab(token_lists, specials, min_freq: int = 1) -> Vocab:
    '''torchtext-compatible vocab build (see module docstring for ordering).'''
    counter = Counter()
    for toks in token_lists:
        counter.update(toks)
    # torchtext: sort alphabetically, then stable sort by freq desc
    words = sorted(w for w in counter if w not in specials)
    words.sort(key=lambda w: counter[w], reverse=True)
    itos = list(specials) + [w for w in words if counter[w] >= min_freq]
    return Vocab(itos, counter)


def read_meta_csv(path: str) -> List[dict]:
    '''Read a tab-separated meta file (columns: video_id, caption, start,
    end, duration, phase, idx) into a list of row dicts with typed fields.'''
    rows = []
    with open(path, newline='') as f:
        reader = csv.DictReader(f, delimiter='\t')
        for r in reader:
            rows.append({
                'video_id': r['video_id'],
                'caption': r.get('caption', ''),
                'start': float(r['start']),
                'end': float(r['end']),
                'duration': float(r['duration']),
                'phase': r.get('phase', ''),
                'idx': int(r['idx']),
            })
    return rows


def build_vocab_from_meta(train_meta_path: str, start_token: str = '<s>',
                          end_token: str = '</s>', pad_token: str = '<blank>',
                          min_freq: int = 1) -> Vocab:
    '''Build the caption vocabulary from the train meta file, matching the
    reference field config (lower=True, spaCy-style tokens).'''
    rows = read_meta_csv(train_meta_path)
    token_lists = (
        [t.lower() for t in tokenize_en(r['caption'])] for r in rows)
    specials = [UNK_TOKEN, pad_token, start_token, end_token]
    return build_vocab(token_lists, specials, min_freq)


def load_glove(glove_txt_path: str, vocab: Vocab, dim: int = 300,
               cache_dir: Optional[str] = None) -> np.ndarray:
    '''Align GloVe vectors to a vocab: (len(vocab), dim) fp32, zeros for OOV
    (torchtext default). Caches the aligned matrix as .npy keyed by the
    vocab CONTENT (md5 of itos), dim and the GloVe file mtime — two
    different vocabs of equal size must not share a cache entry.'''
    cache_path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        content = hashlib.md5(
            '\n'.join(vocab.itos).encode('utf-8')).hexdigest()[:12]
        tag = f'{content}_{dim}_{int(os.path.getmtime(glove_txt_path))}'
        cache_path = os.path.join(cache_dir, f'glove_aligned_{tag}.npy')
        if os.path.exists(cache_path):
            return np.load(cache_path)

    wanted = set(vocab.stoi)
    mat = np.zeros((len(vocab), dim), np.float32)
    with open(glove_txt_path, encoding='utf-8') as f:
        for line in f:
            # split from the RIGHT: glove.840B.300d.txt contains tokens
            # with embedded spaces ('. . .', 'at name@domain.com'), so the
            # word is everything before the last `dim` fields
            sp = line.rstrip().rsplit(' ', dim)
            if len(sp) != dim + 1:
                continue                     # malformed/short line
            word = sp[0]
            if word in wanted:
                mat[vocab.stoi[word]] = np.asarray(sp[1:], np.float32)
    if cache_path:
        # atomic publish: a concurrent process (trainer + eval sharing a
        # cache_dir) must never np.load a partially written cache file
        tmp = f'{cache_path}.tmp-{os.getpid()}.npy'
        np.save(tmp, mat)
        os.replace(tmp, cache_path)
    return mat
