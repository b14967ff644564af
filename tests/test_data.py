'''Data pipeline semantics: vocab ordering, caption encoding, bucketing,
feature crop rules, proposal dense targets.'''
import os

import numpy as np
import pytest

from bmt_tpu.data.captioning import (AUDIO_BUCKETS, CAPTION_BUCKETS,
                                     VIDEO_BUCKETS, bucket_len)
from bmt_tpu.data.features import crop_a_segment, pad_segment
from bmt_tpu.data.tokenizer import tokenize_en
from bmt_tpu.data.vocab import Vocab, build_vocab


def test_vocab_torchtext_ordering():
    '''specials first, then frequency desc with alphabetical tie-break
    (torchtext two-pass sort).'''
    token_lists = [['b', 'a', 'b'], ['c', 'b', 'a'], ['d']]
    v = build_vocab(token_lists, ['<unk>', '<blank>', '<s>', '</s>'])
    assert v.itos[:4] == ['<unk>', '<blank>', '<s>', '</s>']
    # freqs: b=3, a=2, c=1, d=1 -> b, a, then c before d alphabetically
    assert v.itos[4:] == ['b', 'a', 'c', 'd']
    assert v['b'] == 4
    assert v['zzz'] == v.unk_index == 0


def test_vocab_min_freq():
    v = build_vocab([['x', 'x', 'y']], ['<unk>', '<blank>'], min_freq=2)
    assert 'y' not in v.stoi and 'x' in v.stoi


def test_vocab_save_load(tmp_path):
    v = build_vocab([['hello', 'world']], ['<unk>', '<blank>'])
    p = str(tmp_path / 'vocab.json')
    v.save(p)
    v2 = Vocab.load(p)
    assert v2.itos == v.itos


def test_tokenizer_contractions_and_punct():
    assert tokenize_en("He doesn't run.") == \
        ['He', 'does', "n't", 'run', '.']
    assert tokenize_en("it's a well-known fact") == \
        ['it', "'s", 'a', 'well', '-', 'known', 'fact']
    assert tokenize_en('A man, running') == ['A', 'man', ',', 'running']


def test_tokenizer_spacy_2_0_12_behaviors():
    '''Rules pinned to spaCy 2.0.12 (the reference's version,
    conda_env.yml:66), validated by the rebuilt train vocabulary matching
    the checkpoint size 10172 exactly.'''
    # apostrophe-less contraction exceptions
    assert tokenize_en('he cant go') == ['he', 'ca', 'nt', 'go']
    assert tokenize_en('whats that') == ['what', 's', 'that']
    # exception lookup applies to infix-split pieces too
    assert tokenize_en("However,they've added") == \
        ['However', ',', 'they', "'ve", 'added']
    # '#' is a prefix (LIST_PUNCT)
    assert tokenize_en('player #23 scores') == \
        ['player', '#', '23', 'scores']
    # unit suffixes split after digits
    assert tokenize_en('runs 10km far') == ['runs', '10', 'km', 'far']
    # slash infix between letters, NOT digits (1/4 stays whole)
    assert tokenize_en('arms/legs and 1/4 cup') == \
        ['arms', '/', 'legs', 'and', '1/4', 'cup']
    # hyphen infix needs a letter on the left (3-d stays whole)
    assert tokenize_en('a 3-d movie') == ['a', '3-d', 'movie']
    # "'s" is a generic suffix
    assert tokenize_en("she''s here") == ['she', "'", "'s", 'here']
    # URL token_match keeps scheme-like tokens whole
    assert tokenize_en('info for:copyright, here') == \
        ['info', 'for:copyright', ',', 'here']
    # no quote infix in 2.0.12: glued quotes stay inside the token
    assert tokenize_en('said,"keep going') == ['said,"keep', 'going']


@pytest.mark.skipif(not os.path.exists('/root/reference/data/train.csv'),
                    reason='reference mount not available')
def test_vocab_golden_10172():
    '''Rebuilding the vocabulary from the reference train.csv reproduces the
    committed canonical vocab and the reference checkpoint's trg_voc_size of
    10172 (reference: datasets/captioning_dataset.py:41, README.md:115).'''
    from bmt_tpu.data.vocab import build_vocab_from_meta
    v = build_vocab_from_meta('/root/reference/data/train.csv')
    assert len(v) == 10172
    assert v.itos[:4] == ['<unk>', '<blank>', '<s>', '</s>']
    ref = os.path.join(os.path.dirname(__file__), '..', 'data',
                       'vocab_ref.json')
    assert v.itos == Vocab.load(ref).itos


def test_bucket_len():
    assert bucket_len(1, VIDEO_BUCKETS) == 16
    assert bucket_len(16, VIDEO_BUCKETS) == 16
    assert bucket_len(17, VIDEO_BUCKETS) == 32
    assert bucket_len(300, AUDIO_BUCKETS) == 384
    # clamps to the largest bucket
    assert bucket_len(10_000, CAPTION_BUCKETS) == CAPTION_BUCKETS[-1]


def test_crop_a_segment_rules():
    feat = np.arange(20, dtype=np.float32).reshape(10, 2)
    # proportional crop
    out = crop_a_segment(feat, 2.0, 6.0, 10.0)
    np.testing.assert_allclose(out, feat[2:6])
    # degenerate [start==end] -> one frame
    out = crop_a_segment(feat, 3.0, 3.0, 10.0)
    np.testing.assert_allclose(out, feat[3:4])
    # degenerate at the very end: [S:S] -> [S-1:S]
    out = crop_a_segment(feat, 10.0, 10.0, 10.0)
    np.testing.assert_allclose(out, feat[9:10])


def test_pad_segment():
    feat = np.ones((3, 4), np.float32)
    out = pad_segment(feat, 5, 7.0)
    assert out.shape == (5, 4)
    np.testing.assert_allclose(out[:3], 1.0)
    np.testing.assert_allclose(out[3:], 7.0)
    with pytest.raises(AssertionError):
        pad_segment(feat, 2, 0.0)


def test_captioning_dataset_batch_semantics(tmp_path):
    '''Batch assembly: caption wrapping, pad values (rgb/audio = pad_idx,
    flow = 0), fixed bucket shapes.'''
    rng = np.random.default_rng(0)
    (tmp_path / 'v').mkdir()
    (tmp_path / 'a').mkdir()
    rows = []
    for i in range(3):
        vid = f'v_x{i}'
        np.save(tmp_path / 'v' / f'{vid}_rgb.npy',
                rng.normal(size=(8 + i, 4)).astype(np.float32))
        np.save(tmp_path / 'v' / f'{vid}_flow.npy',
                rng.normal(size=(8 + i, 4)).astype(np.float32))
        np.save(tmp_path / 'a' / f'{vid}.npy',
                rng.normal(size=(6 + i, 3)).astype(np.float32))
        rows.append((vid, 'a man runs', 0.0, 10.0, 10.0, 'train', i))
    meta = tmp_path / 'train.csv'
    with open(meta, 'w') as f:
        f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
        for r in rows:
            f.write('\t'.join(map(str, r)) + '\n')

    from bmt_tpu.config import Config
    cfg = Config.from_dict({
        'train_meta_path': str(meta), 'val_1_meta_path': str(meta),
        'val_2_meta_path': str(meta), 'modality': 'audio_video',
        'video_feature_name': 'i3d', 'audio_feature_name': 'vggish',
        'video_features_path': str(tmp_path / 'v'),
        'audio_features_path': str(tmp_path / 'a'),
        'd_vid': 4, 'd_aud': 3, 'start_token': '<s>', 'end_token': '</s>',
        'pad_token': '<blank>', 'min_freq_caps': 1, 'train_batch_size': 3,
        'inference_batch_size': 3, 'max_len': 30,
    })
    from bmt_tpu.data.captioning import CaptioningDataset
    ds = CaptioningDataset(cfg, 'train')
    assert ds.pad_idx == 1 and ds.start_idx == 2 and ds.end_idx == 3

    batch = ds.make_batch([0, 1, 2])
    # caption: <s> a man runs </s> + pad to bucket 16
    cap = batch['caption']
    assert cap.shape == (3, 16)
    a_id, man_id, runs_id = ds.train_vocab['a'], ds.train_vocab['man'], \
        ds.train_vocab['runs']
    assert cap[0, :5].tolist() == [2, a_id, man_id, runs_id, 3]
    assert np.all(cap[0, 5:] == 1)

    # features: full crops (start..end == whole), padded to bucket 16
    assert batch['src']['rgb'].shape == (3, 16, 4)
    assert batch['src']['audio'].shape == (3, 16, 3)
    assert np.all(batch['src']['rgb'][0, 8:] == 1.0)   # pad_idx
    assert np.all(batch['src']['flow'][0, 8:] == 0.0)  # flow pads with 0
    assert np.all(batch['src']['audio'][0, 6:] == 1.0)

    # per-epoch shuffling is deterministic per seed
    b0 = [b['video_ids'] for b in ds.batches(epoch=0, seed=5)]
    b0_again = [b['video_ids'] for b in ds.batches(epoch=0, seed=5)]
    b1 = [b['video_ids'] for b in ds.batches(epoch=1, seed=5)]
    assert b0 == b0_again
    assert b0 != b1 or len(b0) == 1


def test_batch_load_fallback_zero_fills_corrupt_files(tmp_path):
    '''The numpy fallback must zero-fill ANY unreadable file (truncated,
    wrong rank, wrong width) exactly like the native path, so behavior
    cannot differ by backend.'''
    from bmt_tpu.data.native import batch_load
    good = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    p_good = tmp_path / 'good.npy'; np.save(p_good, good)
    p_trunc = tmp_path / 'trunc.npy'; np.save(p_trunc, good)
    raw = p_trunc.read_bytes(); p_trunc.write_bytes(raw[:len(raw) // 2])
    p_3d = tmp_path / 'cube.npy'; np.save(p_3d, np.zeros((2, 2, 4)))
    p_narrow = tmp_path / 'narrow.npy'; np.save(p_narrow, np.zeros((8, 2)))

    paths = [str(p_good), str(p_trunc), str(p_3d), str(p_narrow),
             str(tmp_path / 'missing.npy')]
    out, status = batch_load(paths, [0.0] * 5, [1.0] * 5, [1.0] * 5,
                             [1] * 5, pad_value=7.0, out_len=4, cols=4,
                             use_native=False)
    assert status.tolist() == [0, 1, 1, 1, 1]
    np.testing.assert_allclose(out[1:, 0], np.zeros((4, 4)))
    np.testing.assert_allclose(out[1:, 1:], np.full((4, 3, 4), 7.0))


def test_missing_flow_zeroes_rgb_too(tmp_path, monkeypatch):
    '''Reference parity: a video missing either of rgb/flow zero-fills
    BOTH (the reference loads them in one try block).'''
    from types import SimpleNamespace
    from bmt_tpu.data.captioning import CaptioningDataset

    vdir = tmp_path / 'video'; vdir.mkdir()
    adir = tmp_path / 'audio'; adir.mkdir()
    rng = np.random.default_rng(0)
    np.save(vdir / 'v_x_rgb.npy', rng.normal(size=(6, 3)).astype(np.float32))
    # NO v_x_flow.npy
    np.save(adir / 'v_x.npy', rng.normal(size=(8, 2)).astype(np.float32))

    meta = tmp_path / 'train.csv'
    meta.write_text('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n'
                    'v_x\ta man runs\t0.0\t2.0\t4.0\ttrain\t0\n')
    cfg = SimpleNamespace(
        modality='audio_video', train_meta_path=str(meta),
        val_1_meta_path=str(meta), val_2_meta_path=str(meta),
        video_features_path=str(vdir), audio_features_path=str(adir),
        d_vid=3, d_aud=2, start_token='<s>', end_token='</s>',
        pad_token='<blank>', min_freq_caps=1, max_len=10,
        train_batch_size=1, inference_batch_size=1, vocab_path=None)
    ds = CaptioningDataset(cfg, 'train')
    batch = next(iter(ds.batches(epoch=0, seed=0)))
    assert np.abs(batch['src']['flow']).sum() == 0.0
    rgb = batch['src']['rgb']
    np.testing.assert_allclose(rgb[0, 0], 0.0)          # joint zero-fill
    assert np.all(rgb[0, 1:] == ds.pad_idx)


def _length_spread_dataset(tmp_path, n=24, batch_size=4):
    '''Videos with strongly varied frame counts so bucket padding waste is
    visible: lengths alternate short (6-9) and long (40-64).'''
    rng = np.random.default_rng(2)
    (tmp_path / 'v').mkdir()
    (tmp_path / 'a').mkdir()
    rows = []
    for i in range(n):
        vid = f'v_len{i:02d}'
        S = int(rng.integers(6, 10)) if i % 2 == 0 else \
            int(rng.integers(40, 65))
        np.save(tmp_path / 'v' / f'{vid}_rgb.npy',
                rng.normal(size=(S, 4)).astype(np.float32))
        np.save(tmp_path / 'v' / f'{vid}_flow.npy',
                rng.normal(size=(S, 4)).astype(np.float32))
        np.save(tmp_path / 'a' / f'{vid}.npy',
                rng.normal(size=(S, 3)).astype(np.float32))
        rows.append((vid, 'a man runs', 0.0, 10.0, 10.0, 'train', i))
    meta = tmp_path / 'train.csv'
    with open(meta, 'w') as f:
        f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
        for r in rows:
            f.write('\t'.join(map(str, r)) + '\n')
    from bmt_tpu.config import Config
    return Config.from_dict({
        'train_meta_path': str(meta), 'val_1_meta_path': str(meta),
        'val_2_meta_path': str(meta), 'modality': 'audio_video',
        'video_feature_name': 'i3d', 'audio_feature_name': 'vggish',
        'video_features_path': str(tmp_path / 'v'),
        'audio_features_path': str(tmp_path / 'a'),
        'd_vid': 4, 'd_aud': 3, 'start_token': '<s>', 'end_token': '</s>',
        'pad_token': '<blank>', 'min_freq_caps': 1,
        'train_batch_size': batch_size, 'inference_batch_size': batch_size,
        'max_len': 30,
    })


def test_length_sorted_batching_cuts_padding(tmp_path):
    '''Windowed length sorting groups batchmates into the same bucket:
    fewer padded rows than the uniform shuffle, identical row coverage,
    deterministic per (seed, epoch), and batch order decorrelated from
    length.'''
    from bmt_tpu.data.captioning import CaptioningDataset

    cfg = _length_spread_dataset(tmp_path)
    ds = CaptioningDataset(cfg, 'train')

    def epoch_stats(window):
        ds.cfg.length_sort_window = window
        ids, padded = [], 0
        for b in ds.batches(epoch=0, seed=7, prefetch=0):
            ids.extend(b['video_ids'])
            padded += int(b['src']['rgb'].shape[1]) * len(b['video_ids'])
        return ids, padded

    ids_sorted, cells_sorted = epoch_stats(window=3)
    ids_uniform, cells_uniform = epoch_stats(window=0)

    # same coverage (every row exactly once), different arrangement
    assert sorted(ids_sorted) == sorted(ids_uniform)
    # alternating short/long rows make uniform batches almost always pad
    # short rows to the long bucket; sorting must strictly reduce cells
    assert cells_sorted < cells_uniform

    # deterministic per (seed, epoch)
    ds.cfg.length_sort_window = 3
    again = []
    for b in ds.batches(epoch=0, seed=7, prefetch=0):
        again.extend(b['video_ids'])
    assert again == ids_sorted

    # different epoch -> different arrangement
    other = []
    for b in ds.batches(epoch=1, seed=7, prefetch=0):
        other.extend(b['video_ids'])
    assert other != ids_sorted


def test_rgb_flow_length_mismatch_zero_fills_pair(tmp_path):
    '''A truncated flow stream (fewer rows than rgb) must zero-fill BOTH
    streams like a missing file — a summed rgb+flow mixing real frames
    with pads is a feature vector the reference never produces (it
    asserts rgb.shape == flow.shape, load_features.py:78).'''
    rng = np.random.default_rng(5)
    (tmp_path / 'v').mkdir()
    (tmp_path / 'a').mkdir()
    rows = []
    for i, flow_rows in enumerate([8, 5]):      # second video truncated
        vid = f'v_m{i}'
        np.save(tmp_path / 'v' / f'{vid}_rgb.npy',
                rng.normal(size=(8, 4)).astype(np.float32))
        np.save(tmp_path / 'v' / f'{vid}_flow.npy',
                rng.normal(size=(flow_rows, 4)).astype(np.float32))
        np.save(tmp_path / 'a' / f'{vid}.npy',
                rng.normal(size=(6, 3)).astype(np.float32))
        rows.append((vid, 'a man runs', 0.0, 10.0, 10.0, 'train', i))
    meta = tmp_path / 'train.csv'
    with open(meta, 'w') as f:
        f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
        for r in rows:
            f.write('\t'.join(map(str, r)) + '\n')

    from bmt_tpu.config import Config
    cfg = Config.from_dict({
        'train_meta_path': str(meta), 'val_1_meta_path': str(meta),
        'val_2_meta_path': str(meta), 'modality': 'audio_video',
        'video_feature_name': 'i3d', 'audio_feature_name': 'vggish',
        'video_features_path': str(tmp_path / 'v'),
        'audio_features_path': str(tmp_path / 'a'),
        'd_vid': 4, 'd_aud': 3, 'start_token': '<s>', 'end_token': '</s>',
        'pad_token': '<blank>', 'min_freq_caps': 1, 'train_batch_size': 2,
        'inference_batch_size': 2, 'max_len': 30,
    })
    from bmt_tpu.data.captioning import CaptioningDataset
    ds = CaptioningDataset(cfg, 'train')
    batch = ds.make_batch([0, 1])
    # video 0 intact: real values
    assert not np.all(batch['src']['rgb'][0, :8] == 1.0)
    # video 1 mismatched: rgb zero-row + pad, flow all zeros
    assert np.all(batch['src']['rgb'][1, 0] == 0.0)
    assert np.all(batch['src']['rgb'][1, 1:] == 1.0)
    assert np.all(batch['src']['flow'][1] == 0.0)


def test_prop_dataset_stale_cache_zero_fills(tmp_path, monkeypatch):
    '''A feature file that disappears AFTER the filter cache was written
    must zero-fill (reference fill_missing_features), not crash the epoch
    mid-stream.'''
    import os
    rng = np.random.default_rng(6)
    (tmp_path / 'v').mkdir()
    (tmp_path / 'a').mkdir()
    rows = []
    for i in range(2):
        vid = f'v_s{i}'
        np.save(tmp_path / 'v' / f'{vid}_rgb.npy',
                rng.normal(size=(8, 4)).astype(np.float32))
        np.save(tmp_path / 'v' / f'{vid}_flow.npy',
                rng.normal(size=(8, 4)).astype(np.float32))
        np.save(tmp_path / 'a' / f'{vid}.npy',
                rng.normal(size=(6, 3)).astype(np.float32))
        rows.append((vid, 'a man runs', 1.0, 8.0, 10.0, 'train', i))
    meta = tmp_path / 'train.csv'
    with open(meta, 'w') as f:
        f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
        for r in rows:
            f.write('\t'.join(map(str, r)) + '\n')

    from bmt_tpu.config import Config
    cfg = Config.from_dict({
        'train_meta_path': str(meta), 'val_1_meta_path': str(meta),
        'val_2_meta_path': str(meta), 'modality': 'audio_video',
        'video_feature_name': 'i3d', 'audio_feature_name': 'vggish',
        'video_features_path': str(tmp_path / 'v'),
        'audio_features_path': str(tmp_path / 'a'),
        'd_vid': 4, 'd_aud': 3, 'start_token': '<s>', 'end_token': '</s>',
        'pad_token': '<blank>', 'min_freq_caps': 1, 'train_batch_size': 2,
        'inference_batch_size': 2, 'max_len': 30,
        'pad_audio_feats_up_to': 16, 'pad_video_feats_up_to': 12,
    })
    from bmt_tpu.data.proposal_data import ProposalDataset
    ds = ProposalDataset(cfg, 'train', pad_idx=1,
                         cache_dir=str(tmp_path / 'cache'))
    assert len(ds.video_ids) == 2   # cache written with both present

    os.remove(tmp_path / 'v' / 'v_s1_rgb.npy')   # vanishes post-cache
    ds2 = ProposalDataset(cfg, 'train', pad_idx=1,
                          cache_dir=str(tmp_path / 'cache'))
    assert len(ds2.video_ids) == 2  # stale cache keeps it
    batch = ds2.make_batch(['v_s0', 'v_s1'])     # must NOT crash
    # the vanished pair zero-fills both streams
    assert np.all(batch['src']['rgb'][1, 0] == 0.0)
    assert np.all(batch['src']['flow'][1] == 0.0)
    assert not np.all(batch['src']['rgb'][0, :8] == 1.0)  # intact video


def test_make_batch_local_rows(tmp_path):
    '''Per-host sharded input pipeline: with local_rows=(lo, hi) the batch
    must be identical to the full load on rows [lo, hi) and on every
    non-feature key (geometry, captions, timestamps come from memoized
    headers/metadata so every host agrees), while non-local audio rows
    stay zero (feature IO skipped).'''
    from bmt_tpu.data.captioning import CaptioningDataset

    cfg = _length_spread_dataset(tmp_path, n=8, batch_size=8)
    ds = CaptioningDataset(cfg, 'train')

    full = ds.make_batch(list(range(8)))
    part = ds.make_batch(list(range(8)), local_rows=(2, 5))

    # identical geometry and metadata on all hosts
    for k in ('caption', 'starts', 'ends'):
        np.testing.assert_array_equal(full[k], part[k])
    assert full['video_ids'] == part['video_ids']
    for m in ('rgb', 'flow', 'audio'):
        assert full['src'][m].shape == part['src'][m].shape
        # the local block is bit-identical to the full load
        np.testing.assert_array_equal(full['src'][m][2:5],
                                      part['src'][m][2:5])
    # non-local rows were never read (audio has no joint-fill rewrite)
    np.testing.assert_array_equal(part['src']['audio'][:2], 0.0)
    np.testing.assert_array_equal(part['src']['audio'][5:], 0.0)

    # batches() plumbs local_rows through the prefetcher
    b = next(iter(ds.batches(epoch=0, shuffle=False, prefetch=0,
                             local_rows=(0, 4))))
    assert np.abs(b['src']['audio'][4:]).sum() == 0.0
    assert np.abs(b['src']['audio'][:4]).sum() > 0.0


def test_local_rows_merge_logic():
    '''DataParallel.local_rows: None single-process; on simulated
    multi-process shardings the per-process blocks merge when contiguous
    and fall back (None) when interleaved.'''
    from types import SimpleNamespace
    from bmt_tpu.parallel import DataParallel

    dp = DataParallel(2)
    assert dp.local_rows(8) is None   # single process: load everything

    class FakeSharding:
        def __init__(self, mapping):
            self.mapping = mapping

        def devices_indices_map(self, shape):
            return self.mapping

    class dev:  # hashable fake device (SimpleNamespace is not)
        def __init__(self, pid):
            self.process_index = pid

    import unittest.mock as mock
    with mock.patch('jax.process_count', return_value=2), \
            mock.patch('jax.process_index', return_value=0):
        # contiguous: two local devices own [0,2) and [2,4) of 8 rows
        fake = SimpleNamespace(batch_sh=FakeSharding(dict(
            [(dev(0), (slice(0, 2),)), (dev(0), (slice(2, 4),)),
             (dev(1), (slice(4, 8),))])))
        assert DataParallel.local_rows(fake, 8) == (0, 4)
        # interleaved rows -> fall back to full loading
        fake2 = SimpleNamespace(batch_sh=FakeSharding(dict(
            [(dev(0), (slice(0, 2),)), (dev(1), (slice(2, 4),)),
             (dev(0), (slice(4, 6),)), (dev(1), (slice(6, 8),))])))
        assert DataParallel.local_rows(fake2, 8) is None
        # no local devices at all -> empty block (loads nothing)
        fake3 = SimpleNamespace(batch_sh=FakeSharding(
            {dev(1): (slice(0, 8),)}))
        assert DataParallel.local_rows(fake3, 8) == (0, 0)
        # open-ended slices normalize against B
        fake4 = SimpleNamespace(batch_sh=FakeSharding(
            {dev(0): (slice(None, None),)}))
        assert DataParallel.local_rows(fake4, 8) == (0, 8)


def test_prop_make_batch_local_rows(tmp_path):
    '''ProposalDataset per-host input pipeline: local rows bit-identical
    to the full load, non-local feature rows zero (IO skipped), targets
    and metadata global.'''
    rng = np.random.default_rng(9)
    (tmp_path / 'v').mkdir()
    (tmp_path / 'a').mkdir()
    rows = []
    for i in range(4):
        vid = f'v_p{i}'
        np.save(tmp_path / 'v' / f'{vid}_rgb.npy',
                rng.normal(size=(8, 4)).astype(np.float32))
        np.save(tmp_path / 'v' / f'{vid}_flow.npy',
                rng.normal(size=(8, 4)).astype(np.float32))
        np.save(tmp_path / 'a' / f'{vid}.npy',
                rng.normal(size=(6, 3)).astype(np.float32))
        rows.append((vid, 'a man runs', 1.0, 8.0, 10.0, 'train', i))
    meta = tmp_path / 'train.csv'
    with open(meta, 'w') as f:
        f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
        for r in rows:
            f.write('\t'.join(map(str, r)) + '\n')

    from bmt_tpu.config import Config
    cfg = Config.from_dict({
        'train_meta_path': str(meta), 'val_1_meta_path': str(meta),
        'val_2_meta_path': str(meta), 'modality': 'audio_video',
        'video_feature_name': 'i3d', 'audio_feature_name': 'vggish',
        'video_features_path': str(tmp_path / 'v'),
        'audio_features_path': str(tmp_path / 'a'),
        'd_vid': 4, 'd_aud': 3, 'start_token': '<s>', 'end_token': '</s>',
        'pad_token': '<blank>', 'min_freq_caps': 1, 'train_batch_size': 4,
        'inference_batch_size': 4, 'max_len': 30,
        'pad_audio_feats_up_to': 16, 'pad_video_feats_up_to': 12,
    })
    from bmt_tpu.data.proposal_data import ProposalDataset
    ds = ProposalDataset(cfg, 'train', pad_idx=1,
                         cache_dir=str(tmp_path / 'cache'))
    vids = [f'v_p{i}' for i in range(4)]
    full = ds.make_batch(vids)
    part = ds.make_batch(vids, local_rows=(1, 3))

    for k in ('centers', 'lengths', 'valid'):
        np.testing.assert_array_equal(full[k], part[k])
    assert full['video_ids'] == part['video_ids']
    assert full['duration_in_secs'] == part['duration_in_secs']
    for m in ('rgb', 'flow', 'audio'):
        np.testing.assert_array_equal(full['src'][m][1:3],
                                      part['src'][m][1:3])
        np.testing.assert_array_equal(part['src'][m][0], 0.0)
        np.testing.assert_array_equal(part['src'][m][3], 0.0)

    # batches() plumbs local_rows through the prefetcher
    b = next(iter(ds.batches(epoch=0, shuffle=False, prefetch=0,
                             local_rows=(0, 2))))
    assert np.abs(b['src']['audio'][2:]).sum() == 0.0
    assert np.abs(b['src']['audio'][:2]).sum() > 0.0
