'''Serving subsystem: engine batching parity, micro-batcher coalescing,
HTTP API, and jax.export round-trip (all CPU, tiny dims).'''
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmt_tpu.data.vocab import Vocab
from bmt_tpu.decode import greedy_decode_bimodal
from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.serve import (CaptionEngine, CaptionHTTPServer, MicroBatcher,
                           export_decode, load_exported_decode)

DIMS = CapModelDims(voc_size=23, d_model_A=8, d_model_V=12, d_model_C=10,
                    d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=24, d_ff_C=20,
                    dout_p=0.1, d_vid=20, d_aud=6, use_linear_embedder=True)
PAD, START, END = 1, 2, 3
MAX_LEN = 6


def _vocab():
    itos = ['<unk>', '<blank>', '<s>', '</s>'] + [f'w{i}' for i in range(19)]
    return Vocab(itos)


@pytest.fixture(scope='module')
def engine():
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    return CaptionEngine(params, DIMS, _vocab(), max_len=MAX_LEN,
                        max_batch=8)


def _crop(rng, sv, sa):
    return {'rgb': rng.normal(size=(sv, DIMS.d_vid)).astype(np.float32),
            'flow': rng.normal(size=(sv, DIMS.d_vid)).astype(np.float32),
            'audio': rng.normal(size=(sa, DIMS.d_aud)).astype(np.float32)}


def test_engine_matches_direct_decode(engine):
    '''Ragged crops through the engine == a hand-padded decode at the same
    bucket shapes: validates the engine's padding, batch-fill and slicing.
    (Exact-length vs bucket-padded token parity is a different property —
    masked keys contribute exactly zero, but XLA's reduction grouping over
    the real keys changes with the padded length, so tokens are only
    compared at identical shapes, as everywhere else in the suite.)'''
    from bmt_tpu.data.captioning import bucket_len as _bl
    from bmt_tpu.data.captioning import AUDIO_BUCKETS, VIDEO_BUCKETS
    rng = np.random.default_rng(0)
    crops = [_crop(rng, sv, sa)
             for sv, sa in [(5, 9), (11, 3), (7, 7), (3, 12), (9, 5)]]
    got = engine.caption_tokens(crops)
    assert got.shape == (5, MAX_LEN + 1)

    Bb = engine._bucket_batch(len(crops))
    Sv = _bl(max(c['rgb'].shape[0] for c in crops), VIDEO_BUCKETS)
    Sa = _bl(max(c['audio'].shape[0] for c in crops), AUDIO_BUCKETS)
    batch = engine._pad_batch(crops, Bb, Sv, Sa)
    want = np.asarray(greedy_decode_bimodal(
        engine.params, DIMS, batch, MAX_LEN, START, END, PAD))[:len(crops)]
    np.testing.assert_array_equal(got, want)


def test_engine_chunks_oversized_batches(engine):
    rng = np.random.default_rng(1)
    crops = [_crop(rng, 4, 6) for _ in range(19)]  # max_batch=8 -> 3 chunks
    before = engine.n_batches
    toks = engine.caption_tokens(crops)
    assert toks.shape == (19, MAX_LEN + 1)
    assert engine.n_batches - before == 3


def test_microbatcher_coalesces_and_resolves(engine):
    rng = np.random.default_rng(2)
    crops = [_crop(rng, 6, 6) for _ in range(8)]
    direct = engine.caption_crops(crops)

    # max_wait >> submit time and len(crops) == max_batch: the worker fires
    # exactly once with all 8, so the comparison runs at identical shapes
    # (token parity is only defined at identical shapes — see above)
    batcher = MicroBatcher(engine, max_wait_ms=30_000.0)
    before = engine.n_batches
    try:
        futs = [batcher.submit(c) for c in crops]
        got = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    assert got == direct
    assert engine.n_batches - before == 1


def test_microbatcher_propagates_errors(engine):
    batcher = MicroBatcher(engine, max_wait_ms=1.0)
    try:
        bad = {'rgb': np.zeros((4, 999), np.float32),
               'flow': np.zeros((4, DIMS.d_vid), np.float32),
               'audio': np.zeros((4, DIMS.d_aud), np.float32)}
        with pytest.raises(Exception):
            batcher.caption(bad, timeout=60)
        # batcher survives the failure and still serves good requests
        rng = np.random.default_rng(3)
        assert isinstance(batcher.caption(_crop(rng, 4, 4), timeout=60), str)
    finally:
        batcher.close()


def test_http_server_roundtrip(engine):
    server = CaptionHTTPServer(('127.0.0.1', 0), engine, max_wait_ms=1.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/healthz', timeout=30) as r:
            assert json.load(r) == {'status': 'ok'}

        rng = np.random.default_rng(4)
        crop = _crop(rng, 5, 7)
        body = json.dumps(
            {'features': {k: v.tolist() for k, v in crop.items()}}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption', data=body,
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=120) as r:
            sentence = json.load(r)['sentence']
        assert sentence == engine.caption_crops([crop])[0]

        # malformed feature shape -> 400, not a crash
        bad = json.dumps({'features': {'rgb': [[1.0]], 'flow': [[1.0]],
                                       'audio': [[1.0]]}}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption', data=bad,
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/stats', timeout=30) as r:
            stats = json.load(r)
        assert stats['requests'] >= 1
        # operational metrics: latency percentiles recorded for the
        # successful request above, live queue currently drained
        assert stats['latency_samples'] >= 1
        assert stats['latency_ms']['p50'] > 0
        assert stats['latency_ms']['p99'] >= stats['latency_ms']['p50']
        assert stats['queue_depth'] == 0
    finally:
        server.shutdown()


def test_export_decode_roundtrip(engine):
    '''jax.export blob reproduces the live decode exactly.'''
    blob = export_decode(engine.params, DIMS, batch=2, Sv=4, Sa=6,
                         max_len=MAX_LEN, start_idx=START, end_idx=END,
                         pad_idx=PAD)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_exported_decode(blob)

    rng = np.random.default_rng(5)
    stacks = {
        'rgb': jnp.asarray(rng.normal(size=(2, 4, DIMS.d_vid)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(2, 4, DIMS.d_vid)),
                            jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(2, 6, DIMS.d_aud)),
                             jnp.float32),
    }
    want = np.asarray(greedy_decode_bimodal(
        engine.params, DIMS, stacks, MAX_LEN, START, END, PAD))
    got = np.asarray(fn(engine.params, stacks))
    np.testing.assert_array_equal(got, want)


def test_warmup_compiles_grid(engine):
    before = engine.stats()
    n = engine.warmup(batch_sizes=(1, 2), shapes=((4, 4),))
    assert n == 2
    assert engine.stats() == before  # warmup never pollutes /stats


def test_engine_empty_input(engine):
    toks = engine.caption_tokens([])
    assert toks.shape == (0, MAX_LEN + 1)
    assert engine.caption_crops([]) == []


def test_http_rejects_non_dict_json(engine):
    '''Malformed-but-valid JSON gets a 400 response, never a dropped
    connection.'''
    server = CaptionHTTPServer(('127.0.0.1', 0), engine, max_wait_ms=1.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        for body in (b'[1,2,3]', b'{"features": null}',
                     b'{"features": "rgbflowaudio"}',
                     b'{"features": {"rgb": {"a": 1}, "flow": [[1]], '
                     b'"audio": [[1]]}}'):
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/caption', data=body,
                headers={'Content-Type': 'application/json'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400, body
    finally:
        server.shutdown()


def test_serve_cli_with_native_checkpoint(tmp_path):
    '''End-to-end: save a native checkpoint, start the CLI server against
    it (no data files needed — config + vocab live in the meta), POST a
    caption request.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.models import init_bimodal_transformer as init_fn
    from bmt_tpu.scripts import serve as serve_cli
    from bmt_tpu.train.checkpoint import save_checkpoint

    argv = ['--procedure', 'train_cap', '--d_vid', str(DIMS.d_vid),
            '--d_aud', str(DIMS.d_aud), '--use_linear_embedder',
            '--d_model_video', '12', '--d_model_audio', '8',
            '--d_model', '16', '--d_model_caps', '10', '--H', '2',
            '--N', '2', '--max_len', str(MAX_LEN), '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    vocab = _vocab()
    dims = __import__('bmt_tpu.models', fromlist=['CapModelDims']) \
        .CapModelDims.from_config(cfg, len(vocab))
    params = init_fn(jax.random.PRNGKey(0), dims)
    ckpt = tmp_path / 'ckpt'
    save_checkpoint(str(ckpt), params,
                    {'config': cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': vocab.itos})

    server = serve_cli.main(
        ['--pretrained_cap_model_path', str(ckpt), '--port', '0',
         '--compute_dtype', 'float32', '--max_wait_ms', '1',
         '--warmup_shapes', '4x4', '--warmup_batches', '1'],
        block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(6)
        crop = {'rgb': rng.normal(size=(5, DIMS.d_vid)).tolist(),
                'flow': rng.normal(size=(5, DIMS.d_vid)).tolist(),
                'audio': rng.normal(size=(7, DIMS.d_aud)).tolist()}
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption',
            data=json.dumps({'features': crop}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert isinstance(json.load(r)['sentence'], str)
    finally:
        server.shutdown()


def test_video_pipeline_predict(engine):
    '''Full two-stage pipeline: proposal model -> crops -> captions.'''
    from types import SimpleNamespace
    from bmt_tpu.models import (PropModelDims,
                                init_multimodal_proposal_generator)
    from bmt_tpu.serve import VideoPipeline

    prop_dims = PropModelDims(
        d_model_A=8, d_model_V=12, d_model=16, H=2, N=1, d_ff_A=16,
        d_ff_V=24, kernel_sizes_A=(3,), kernel_sizes_V=(3,),
        conv_layers_A=(16,), conv_layers_V=(16,),
        anchors_num_A=2, anchors_num_V=2, dout_p=0.1,
        d_vid=DIMS.d_vid, d_aud=DIMS.d_aud, use_linear_embedder=True)
    prop_params = init_multimodal_proposal_generator(
        jax.random.PRNGKey(1), prop_dims)
    prop_params['anchors_A'] = jnp.asarray([2.0, 6.0])
    prop_params['anchors_V'] = jnp.asarray([3.0, 9.0])
    prop_cfg = SimpleNamespace(
        pad_feats_up_to={'audio': 16, 'video': 12},
        max_prop_per_vid=5, modality='audio_video')

    pipeline = VideoPipeline(engine, prop_params, prop_dims, prop_cfg)
    rng = np.random.default_rng(7)
    feats = {'rgb': rng.normal(size=(10, DIMS.d_vid)).astype(np.float32),
             'flow': rng.normal(size=(10, DIMS.d_vid)).astype(np.float32),
             'audio': rng.normal(size=(14, DIMS.d_aud)).astype(np.float32)}
    results = pipeline.predict(feats, duration=30.0)
    assert 0 < len(results) <= 5
    for r in results:
        assert set(r) == {'start', 'end', 'sentence'}
        assert 0.0 <= r['start'] <= r['end'] <= 30.0
        assert isinstance(r['sentence'], str)
    # NMS with a tight threshold can only shrink the proposal set
    nms_results = pipeline.predict(feats, duration=30.0, nms_tiou=0.01)
    assert len(nms_results) <= len(results)


def test_http_predict_endpoint(engine):
    from types import SimpleNamespace
    from bmt_tpu.models import (PropModelDims,
                                init_multimodal_proposal_generator)
    from bmt_tpu.serve import VideoPipeline

    prop_dims = PropModelDims(
        d_model_A=8, d_model_V=12, d_model=16, H=2, N=1, d_ff_A=16,
        d_ff_V=24, kernel_sizes_A=(3,), kernel_sizes_V=(3,),
        conv_layers_A=(16,), conv_layers_V=(16,),
        anchors_num_A=2, anchors_num_V=2, dout_p=0.1,
        d_vid=DIMS.d_vid, d_aud=DIMS.d_aud, use_linear_embedder=True)
    prop_params = init_multimodal_proposal_generator(
        jax.random.PRNGKey(1), prop_dims)
    prop_params['anchors_A'] = jnp.asarray([2.0, 6.0])
    prop_params['anchors_V'] = jnp.asarray([3.0, 9.0])
    prop_cfg = SimpleNamespace(
        pad_feats_up_to={'audio': 16, 'video': 12},
        max_prop_per_vid=4, modality='audio_video')
    pipeline = VideoPipeline(engine, prop_params, prop_dims, prop_cfg)

    server = CaptionHTTPServer(('127.0.0.1', 0), engine, max_wait_ms=1.0,
                               pipeline=pipeline)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(8)
        feats = {k: rng.normal(size=(10, d)).tolist()
                 for k, d in (('rgb', DIMS.d_vid), ('flow', DIMS.d_vid),
                              ('audio', DIMS.d_aud))}
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict',
            data=json.dumps({'features': feats, 'duration': 20.0}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=120) as r:
            results = json.load(r)['results']
        assert results and all('sentence' in x for x in results)

        # missing duration -> 400
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict',
            data=json.dumps({'features': feats}).encode(),
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_http_predict_without_pipeline_404(engine):
    server = CaptionHTTPServer(('127.0.0.1', 0), engine, max_wait_ms=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict', data=b'{}',
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 404
    finally:
        server.shutdown()


def test_serve_cli_with_prop_checkpoint(tmp_path):
    '''CLI end-to-end with both checkpoints: /predict works.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.models import (CapModelDims, PropModelDims,
                                init_bimodal_transformer,
                                init_multimodal_proposal_generator)
    from bmt_tpu.scripts import serve as serve_cli
    from bmt_tpu.train.checkpoint import save_checkpoint

    cap_argv = ['--procedure', 'train_cap', '--d_vid', str(DIMS.d_vid),
                '--d_aud', str(DIMS.d_aud), '--use_linear_embedder',
                '--d_model_video', '12', '--d_model_audio', '8',
                '--d_model', '16', '--d_model_caps', '10', '--H', '2',
                '--N', '2', '--max_len', str(MAX_LEN), '--dont_log']
    cap_cfg = Config(build_parser().parse_args(cap_argv))
    vocab = _vocab()
    cap_dims = CapModelDims.from_config(cap_cfg, len(vocab))
    cap_params = init_bimodal_transformer(jax.random.PRNGKey(0), cap_dims)
    cap_dir = tmp_path / 'cap'
    save_checkpoint(str(cap_dir), cap_params,
                    {'config': cap_cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': vocab.itos})

    prop_argv = ['--procedure', 'train_prop', '--d_vid', str(DIMS.d_vid),
                 '--d_aud', str(DIMS.d_aud), '--use_linear_embedder',
                 '--d_model_video', '12', '--d_model_audio', '8',
                 '--d_model', '16', '--H', '2', '--N', '1',
                 '--anchors_num_audio', '2', '--anchors_num_video', '2',
                 '--kernel_sizes_audio', '3', '--kernel_sizes_video', '3',
                 '--conv_layers_audio', '16', '--conv_layers_video', '16',
                 '--pad_audio_feats_up_to', '16',
                 '--pad_video_feats_up_to', '12', '--dont_log']
    prop_cfg = Config(build_parser().parse_args(prop_argv))
    prop_dims = PropModelDims.from_config(prop_cfg)
    prop_params = init_multimodal_proposal_generator(jax.random.PRNGKey(1),
                                                     prop_dims)
    prop_params['anchors_A'] = jnp.asarray([2.0, 6.0])
    prop_params['anchors_V'] = jnp.asarray([3.0, 9.0])
    prop_dir = tmp_path / 'prop'
    save_checkpoint(str(prop_dir), prop_params,
                    {'config': prop_cfg.to_dict(), 'epoch': 0},
                    name='best_prop_model')

    server = serve_cli.main(
        ['--pretrained_cap_model_path', str(cap_dir),
         '--prop_generator_model_path', str(prop_dir),
         '--max_prop_per_vid', '4', '--port', '0',
         '--compute_dtype', 'float32', '--max_wait_ms', '1',
         '--warmup_shapes', '4x4', '--warmup_batches', '1'],
        block=False)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(9)
        feats = {k: rng.normal(size=(10, d)).tolist()
                 for k, d in (('rgb', DIMS.d_vid), ('flow', DIMS.d_vid),
                              ('audio', DIMS.d_aud))}
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/predict',
            data=json.dumps({'features': feats, 'duration': 25.0}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=120) as r:
            results = json.load(r)['results']
        assert results and all(
            set(x) == {'start', 'end', 'sentence'} for x in results)
    finally:
        server.shutdown()


def test_engine_dp_sharded_matches_single_device():
    '''dp8-sharded engine decode == single-device, token for token (the
    same equivalence the validation loops pin).'''
    from bmt_tpu.parallel import DataParallel
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    vocab = _vocab()
    single = CaptionEngine(params, DIMS, vocab, max_len=MAX_LEN,
                           max_batch=8)
    sharded = CaptionEngine(params, DIMS, vocab, max_len=MAX_LEN,
                            max_batch=8, dp=DataParallel(8))
    rng = np.random.default_rng(11)
    crops = [_crop(rng, 6, 6) for _ in range(8)]
    np.testing.assert_array_equal(sharded.caption_tokens(crops),
                                  single.caption_tokens(crops))
    # small request: the dp engine rounds the bucket UP to n_dp (8) so it
    # still shards; rows are batch-independent, so tokens match the
    # single-device engine's smaller (Bb=4) bucket exactly
    crops3 = [_crop(rng, 4, 4) for _ in range(3)]
    np.testing.assert_array_equal(sharded.caption_tokens(crops3),
                                  single.caption_tokens(crops3))
    assert sharded._bucket_batch(3) == 8 and single._bucket_batch(3) == 4

    # max_batch not divisible by the mesh is rejected up front
    with pytest.raises(ValueError):
        CaptionEngine(params, DIMS, vocab, max_len=MAX_LEN, max_batch=6,
                      dp=DataParallel(8))


def test_engine_custom_decode_fn(engine):
    '''Pluggable decode: beam and sampling fns slot into the engine.'''
    from bmt_tpu.decode import make_bimodal_beam_fn, make_bimodal_sample_fn
    params = engine.params
    rng = np.random.default_rng(12)
    crops = [_crop(rng, 5, 6) for _ in range(3)]

    beam_engine = CaptionEngine(
        params, DIMS, engine.vocab, max_len=MAX_LEN, max_batch=8,
        decode_fn=make_bimodal_beam_fn(DIMS, MAX_LEN, START, END, PAD,
                                       beam_size=2))
    toks = beam_engine.caption_tokens(crops)
    assert toks.shape == (3, MAX_LEN + 1)
    assert (toks[:, 0] == START).all()

    sample_engine = CaptionEngine(
        params, DIMS, engine.vocab, max_len=MAX_LEN, max_batch=8,
        decode_fn=make_bimodal_sample_fn(DIMS, MAX_LEN, START, END, PAD,
                                         temperature=1.2, seed=3))
    sents = sample_engine.caption_crops(crops)
    assert len(sents) == 3 and all(isinstance(s, str) for s in sents)


def test_serve_cli_sample_strategy(tmp_path):
    '''CLI end-to-end with --decode_strategy sample.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.models import init_bimodal_transformer as init_fn
    from bmt_tpu.models import CapModelDims
    from bmt_tpu.scripts import serve as serve_cli
    from bmt_tpu.train.checkpoint import save_checkpoint

    argv = ['--procedure', 'train_cap', '--d_vid', str(DIMS.d_vid),
            '--d_aud', str(DIMS.d_aud), '--use_linear_embedder',
            '--d_model_video', '12', '--d_model_audio', '8',
            '--d_model', '16', '--d_model_caps', '10', '--H', '2',
            '--N', '2', '--max_len', str(MAX_LEN), '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    vocab = _vocab()
    dims = CapModelDims.from_config(cfg, len(vocab))
    params = init_fn(jax.random.PRNGKey(0), dims)
    ckpt = tmp_path / 'ckpt'
    save_checkpoint(str(ckpt), params,
                    {'config': cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': vocab.itos})

    server = serve_cli.main(
        ['--pretrained_cap_model_path', str(ckpt), '--port', '0',
         '--compute_dtype', 'float32', '--max_wait_ms', '1',
         '--decode_strategy', 'sample', '--temperature', '1.3',
         '--sample_top_p', '0.9',
         '--warmup_shapes', '4x4', '--warmup_batches', '1'],
        block=False)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(13)
        crop = {'rgb': rng.normal(size=(5, DIMS.d_vid)).tolist(),
                'flow': rng.normal(size=(5, DIMS.d_vid)).tolist(),
                'audio': rng.normal(size=(7, DIMS.d_aud)).tolist()}
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption',
            data=json.dumps({'features': crop}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert isinstance(json.load(r)['sentence'], str)
    finally:
        server.shutdown()


def test_bucket_batch_non_power_of_two_dp():
    '''dp=6 (non-power-of-two): buckets round up to dp multiples and the
    default warmup grid covers every reachable bucket incl. max_batch.'''
    from bmt_tpu.parallel import DataParallel
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    eng = CaptionEngine(params, DIMS, _vocab(), max_len=MAX_LEN,
                        max_batch=12, dp=DataParallel(6))
    assert eng._bucket_batch(1) == 6
    assert eng._bucket_batch(7) == 12      # bucket 8 -> dp-rounded 12
    assert eng._bucket_batch(12) == 12
    rng = np.random.default_rng(14)
    toks = eng.caption_tokens([_crop(rng, 4, 4)])   # actually shards
    assert toks.shape == (1, MAX_LEN + 1)
    n = eng.warmup(shapes=((4, 4),))
    assert n == len({6, 12})               # reachable buckets only


def test_overlength_crop_rejected(engine):
    from bmt_tpu.data.captioning import VIDEO_BUCKETS
    rng = np.random.default_rng(15)
    bad = {'rgb': rng.normal(size=(VIDEO_BUCKETS[-1] + 1,
                                   DIMS.d_vid)).astype(np.float32),
           'flow': rng.normal(size=(VIDEO_BUCKETS[-1] + 1,
                                    DIMS.d_vid)).astype(np.float32),
           'audio': rng.normal(size=(4, DIMS.d_aud)).astype(np.float32)}
    with pytest.raises(ValueError):
        engine.caption_tokens([bad])

    # HTTP: over-length is a 400 at admission, not a batch poisoner
    server = CaptionHTTPServer(('127.0.0.1', 0), engine, max_wait_ms=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {'features': {k: v.tolist() for k, v in bad.items()}}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption', data=body,
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_backpressure_queue_full(engine):
    '''Past max_queue, submissions shed load: QueueFull / HTTP 503.'''
    from bmt_tpu.serve import QueueFull
    rng = np.random.default_rng(16)
    crop = _crop(rng, 4, 4)

    batcher = MicroBatcher(engine, max_wait_ms=30_000.0, max_queue=2)
    try:
        batcher.submit(crop)
        batcher.submit(crop)
        with pytest.raises(QueueFull):
            batcher.submit(crop)
    finally:
        batcher.close()   # drains the two queued requests

    server = CaptionHTTPServer(('127.0.0.1', 0), engine,
                               max_wait_ms=30_000.0, max_queue=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {'features': {k: v.tolist() for k, v in crop.items()}}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption', data=body,
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
    finally:
        server.shutdown()


def test_deadline_shedding_bounds_queue_age(engine):
    """deadline_ms: a request older than the deadline at drain time is
    shed with DeadlineExceeded (HTTP 504) instead of decoded — the tail
    is bounded by policy, not queue growth."""
    from bmt_tpu.serve import DeadlineExceeded
    rng = np.random.default_rng(17)
    crop = _crop(rng, 4, 4)

    # the worker drains max_wait_ms after the first submit, by which time
    # the request has aged far past the (tiny) deadline -> shed
    batcher = MicroBatcher(engine, max_wait_ms=100.0, deadline_ms=1.0)
    try:
        fut = batcher.submit(crop)
        with pytest.raises(DeadlineExceeded):
            fut.result(timeout=30)
        assert batcher.stats()['shed'] == 1
    finally:
        batcher.close()

    # generous deadline: nothing sheds, requests resolve normally
    batcher = MicroBatcher(engine, max_wait_ms=1.0, deadline_ms=60_000.0)
    try:
        assert isinstance(batcher.caption(crop, timeout=60), str)
        assert batcher.stats()['shed'] == 0
    finally:
        batcher.close()

    server = CaptionHTTPServer(('127.0.0.1', 0), engine,
                               max_wait_ms=100.0, deadline_ms=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {'features': {k: v.tolist() for k, v in crop.items()}}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption', data=body,
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 504
    finally:
        server.shutdown()


def test_flow_length_mismatch_rejected(engine):
    '''A flow stream longer than rgb must be rejected (engine API and
    HTTP), not silently truncated to the rgb-derived bucket.'''
    import urllib.error
    rng = np.random.default_rng(21)
    bad = _crop(rng, 5, 4)
    bad['flow'] = rng.normal(size=(9, DIMS.d_vid)).astype(np.float32)
    with pytest.raises(ValueError, match='mismatch'):
        engine.caption_tokens([bad])

    server = CaptionHTTPServer(('127.0.0.1', 0), engine, max_wait_ms=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {'features': {k: v.tolist() for k, v in bad.items()}}).encode()
        req = urllib.request.Request(
            f'http://127.0.0.1:{port}/caption', data=body,
            headers={'Content-Type': 'application/json'})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert 'mismatch' in ei.value.read().decode()
    finally:
        server.shutdown()


def test_microbatcher_rejects_bad_crop_at_admission(engine):
    '''A malformed crop must fail its OWN submit() call; concurrent
    healthy requests coalesced around it are unaffected.'''
    rng = np.random.default_rng(33)
    batcher = MicroBatcher(engine, max_wait_ms=20.0)
    try:
        good_futs = [batcher.submit(_crop(rng, 5, 4)) for _ in range(3)]
        bad = _crop(rng, 5, 4)
        bad['flow'] = rng.normal(size=(9, DIMS.d_vid)).astype(np.float32)
        with pytest.raises(ValueError, match='mismatch'):
            batcher.submit(bad)
        for f in good_futs:
            assert isinstance(f.result(timeout=120), str)
    finally:
        batcher.close()


def test_cancelled_future_does_not_poison_batch(engine):
    '''A client cancelling its own request (timeout) must not fail the
    coalesced batchmates, and an undispatched cancelled crop is dropped
    at drain time instead of wasting device work.'''
    rng = np.random.default_rng(41)
    batcher = MicroBatcher(engine, max_wait_ms=150.0)
    try:
        f_good1 = batcher.submit(_crop(rng, 5, 4))
        f_dead = batcher.submit(_crop(rng, 5, 4))
        assert f_dead.cancel()          # client gave up before dispatch
        f_good2 = batcher.submit(_crop(rng, 5, 4))
        assert isinstance(f_good1.result(timeout=120), str)
        assert isinstance(f_good2.result(timeout=120), str)
        assert f_dead.cancelled()
    finally:
        batcher.close()


# ---------------------------------------------------------------------------
# multi-tenant LoRA serving (engine.add_adapter, {"adapter": name})
# ---------------------------------------------------------------------------

def _adapter_sites(bump=0.0, rank=2, key=7):
    '''LoRA sites for DIMS via a real finetuned-checkpoint round trip.'''
    from bmt_tpu.ops.lora import add_lora
    from bmt_tpu.train.checkpoint import load_lora_sites
    base = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    adapted = add_lora(base, rank, jax.random.PRNGKey(key),
                       targets='attn_ffn')

    def walk(node):
        if isinstance(node, dict):
            return {k: (v + bump if k == 'lora_b' else walk(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return load_lora_sites(walk(adapted))


def test_engine_adapter_selection(engine):
    '''Zero-init adapter decodes IDENTICALLY to the base; a nonzero
    adapter changes the decode; unknown names are rejected; /stats lists
    the registry. The adapter trees share the base arrays.'''
    rng = np.random.default_rng(11)
    crops = [_crop(rng, 6, 6) for _ in range(3)]
    base_out = engine.caption_tokens(crops)

    n = engine.add_adapter('zero', _adapter_sites(bump=0.0))
    assert n > 0
    np.testing.assert_array_equal(
        engine.caption_tokens(crops, adapter='zero'), base_out)

    engine.add_adapter('loud', _adapter_sites(bump=1.0))
    loud = engine.caption_tokens(crops, adapter='loud')
    assert not np.array_equal(loud, base_out)

    with pytest.raises(ValueError, match='unknown adapter'):
        engine.caption_tokens(crops, adapter='nope')
    assert set(engine.stats()['adapters']) >= {'zero', 'loud'}

    # HBM sharing: the adapter tree's base leaves ARE the engine's arrays
    a_tree = engine.adapters['loud']
    assert a_tree['encoder']['layers'][0]['ff_M1']['fc1']['w'] is \
        engine.params['encoder']['layers'][0]['ff_M1']['fc1']['w']


def test_engine_adapter_shape_mismatch_rejected(engine):
    sites = _adapter_sites()
    site, leaves = next(iter(sites.items()))
    bad = dict(leaves)
    bad['lora_a'] = np.zeros((leaves['lora_a'].shape[0] + 1,
                              leaves['lora_a'].shape[1]), np.float32)
    with pytest.raises(ValueError, match='do not fit'):
        engine.add_adapter('bad', {site: bad})


def test_microbatcher_groups_by_adapter(engine):
    '''Interleaved base/adapter submits all resolve, each against its own
    params (one adapter per device batch, oldest-first grouping).'''
    engine.add_adapter('grp', _adapter_sites(bump=1.0))
    rng = np.random.default_rng(12)
    crops = [_crop(rng, 5, 5) for _ in range(6)]
    want_base = engine.caption_crops(crops)
    want_grp = engine.caption_crops(crops, adapter='grp')

    batcher = MicroBatcher(engine, max_wait_ms=30_000.0)
    try:
        futs = []
        for i, c in enumerate(crops):
            futs.append(batcher.submit(c))                      # base
            futs.append(batcher.submit(c, adapter='grp'))       # adapter
        got = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    assert got[0::2] == want_base
    assert got[1::2] == want_grp
    # admission check: unknown adapter fails ITS OWN submit
    with pytest.raises(ValueError, match='unknown adapter'):
        MicroBatcher(engine, max_wait_ms=1.0).submit(crops[0],
                                                     adapter='nope')


def test_http_adapter_selection(engine):
    engine.add_adapter('web', _adapter_sites(bump=1.0))
    server = CaptionHTTPServer(('127.0.0.1', 0), engine, max_wait_ms=1.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(13)
        crop = _crop(rng, 4, 4)
        body = {'features': {k: v.tolist() for k, v in crop.items()}}

        def post(payload):
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/caption',
                data=json.dumps(payload).encode(),
                headers={'Content-Type': 'application/json'})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, out = post(body)
        assert code == 200 and isinstance(out['sentence'], str)
        code, out = post({**body, 'adapter': 'web'})
        assert code == 200 and isinstance(out['sentence'], str)
        code, out = post({**body, 'adapter': 'missing'})
        assert code == 400 and 'unknown adapter' in out['error']
        code, out = post({**body, 'adapter': 7})
        assert code == 400

        with urllib.request.urlopen(
                f'http://127.0.0.1:{port}/stats', timeout=30) as r:
            stats = json.loads(r.read())
        assert 'web' in stats['adapters']
    finally:
        server.shutdown()


def test_serve_cli_with_lora_adapter(tmp_path):
    '''CLI end-to-end: base checkpoint + a LoRA finetune checkpoint wired
    via --lora_adapter; per-request adapter selection over HTTP.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.models import CapModelDims
    from bmt_tpu.models import init_bimodal_transformer as init_fn
    from bmt_tpu.ops.lora import add_lora
    from bmt_tpu.scripts import serve as serve_cli
    from bmt_tpu.train.checkpoint import save_checkpoint

    argv = ['--procedure', 'train_cap', '--d_vid', str(DIMS.d_vid),
            '--d_aud', str(DIMS.d_aud), '--use_linear_embedder',
            '--d_model_video', '12', '--d_model_audio', '8',
            '--d_model', '16', '--d_model_caps', '10', '--H', '2',
            '--N', '2', '--max_len', str(MAX_LEN), '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    vocab = _vocab()
    dims = CapModelDims.from_config(cfg, len(vocab))
    params = init_fn(jax.random.PRNGKey(0), dims)
    ckpt = tmp_path / 'ckpt'
    save_checkpoint(str(ckpt), params,
                    {'config': cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': vocab.itos})
    # a "finetuned" checkpoint: adapters with a visible delta
    adapted = add_lora(params, 2, jax.random.PRNGKey(9),
                       targets='attn_ffn')

    def walk(node):
        if isinstance(node, dict):
            return {k: (v + 1.0 if k == 'lora_b' else walk(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    lora_ckpt = tmp_path / 'lora_ckpt'
    save_checkpoint(str(lora_ckpt), walk(adapted),
                    {'config': cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': vocab.itos})

    server = serve_cli.main(
        ['--pretrained_cap_model_path', str(ckpt), '--port', '0',
         '--compute_dtype', 'float32', '--max_wait_ms', '1',
         '--warmup_shapes', '4x4', '--warmup_batches', '1',
         '--lora_adapter', f'sports={lora_ckpt}'],
        block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(8)
        crop = {'rgb': rng.normal(size=(5, DIMS.d_vid)).tolist(),
                'flow': rng.normal(size=(5, DIMS.d_vid)).tolist(),
                'audio': rng.normal(size=(7, DIMS.d_aud)).tolist()}

        def post(payload):
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/caption',
                data=json.dumps(payload).encode(),
                headers={'Content-Type': 'application/json'})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.load(r)

        base = post({'features': crop})['sentence']
        tuned = post({'features': crop, 'adapter': 'sports'})['sentence']
        assert isinstance(base, str) and isinstance(tuned, str)
    finally:
        server.shutdown()


def test_beam_decode_with_adapter(engine):
    '''Adapters flow through pluggable decode fns too (decode_fn receives
    the selected params; the delta applies inside the linear dispatch).'''
    from bmt_tpu.decode import make_bimodal_beam_fn
    beam_engine = CaptionEngine(
        engine.params, DIMS, engine.vocab, max_len=MAX_LEN, max_batch=8,
        decode_fn=make_bimodal_beam_fn(DIMS, MAX_LEN, START, END, PAD,
                                       beam_size=2))
    beam_engine.add_adapter('zero', _adapter_sites(bump=0.0))
    beam_engine.add_adapter('loud', _adapter_sites(bump=1.0))
    rng = np.random.default_rng(14)
    crops = [_crop(rng, 5, 6) for _ in range(2)]
    base = beam_engine.caption_tokens(crops)
    np.testing.assert_array_equal(
        beam_engine.caption_tokens(crops, adapter='zero'), base)
    assert not np.array_equal(
        beam_engine.caption_tokens(crops, adapter='loud'), base)


def test_pipeline_predict_with_adapter(engine):
    '''/predict's captioning half honours adapter selection.'''
    from bmt_tpu.models import PropModelDims
    from bmt_tpu.models import init_multimodal_proposal_generator
    from bmt_tpu.serve import VideoPipeline

    engine.add_adapter('pipe', _adapter_sites(bump=1.0))
    pdims = PropModelDims(d_model_A=8, d_model_V=12, d_model=16, H=2, N=1,
                          d_ff_A=16, d_ff_V=24, d_vid=DIMS.d_vid,
                          d_aud=DIMS.d_aud, use_linear_embedder=True,
                          kernel_sizes_A=(3,), kernel_sizes_V=(3,),
                          conv_layers_A=(8,), conv_layers_V=(8,),
                          anchors_num_A=2, anchors_num_V=2)
    pparams = init_multimodal_proposal_generator(jax.random.PRNGKey(1),
                                                 pdims)
    pparams['anchors_A'] = jnp.asarray([2.0, 5.0])
    pparams['anchors_V'] = jnp.asarray([2.0, 5.0])

    class _PropCfg:
        pad_feats_up_to = {'audio': 16, 'video': 16}
        max_prop_per_vid = 4
        modality = 'audio_video'

    pipe = VideoPipeline(engine, pparams, pdims, _PropCfg())
    rng = np.random.default_rng(15)
    feats = {'rgb': rng.normal(size=(10, DIMS.d_vid)).astype(np.float32),
             'flow': rng.normal(size=(10, DIMS.d_vid)).astype(np.float32),
             'audio': rng.normal(size=(12, DIMS.d_aud)).astype(np.float32)}
    out = pipe.predict(feats, duration=20.0, adapter='pipe')
    assert all(set(r) == {'start', 'end', 'sentence'} for r in out)
    with pytest.raises(ValueError, match='unknown adapter'):
        pipe.predict(feats, duration=20.0, adapter='nope')


def test_dp_sharded_engine_with_adapter():
    '''Adapter decode on a dp8 mesh == single-device adapter decode (the
    grafted deltas replicate onto the mesh; base leaves stay shared).'''
    from bmt_tpu.parallel import DataParallel
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    vocab = _vocab()
    single = CaptionEngine(params, DIMS, vocab, max_len=MAX_LEN,
                           max_batch=8)
    sharded = CaptionEngine(params, DIMS, vocab, max_len=MAX_LEN,
                            max_batch=8, dp=DataParallel(8))
    sites = _adapter_sites(bump=1.0)
    single.add_adapter('a', sites)
    sharded.add_adapter('a', sites)
    rng = np.random.default_rng(16)
    crops = [_crop(rng, 6, 6) for _ in range(8)]
    np.testing.assert_array_equal(
        sharded.caption_tokens(crops, adapter='a'),
        single.caption_tokens(crops, adapter='a'))


def test_warmup_covers_adapters():
    '''Warmup compiles adapter executables too (different treedef than the
    base), deduplicated by tree signature: two same-rank adapters share
    one compiled decode, so the grid warms base + ONE representative.'''
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    eng = CaptionEngine(params, DIMS, _vocab(), max_len=MAX_LEN,
                        max_batch=8)
    eng.add_adapter('a', _adapter_sites(bump=0.5, key=21))
    eng.add_adapter('b', _adapter_sites(bump=1.5, key=22))   # same rank
    n = eng.warmup(batch_sizes=(1, 2), shapes=((4, 4),))
    assert n == 4   # 2 grid points x (base + 1 adapter representative)
    # steady state: the first adapter request after warmup reuses the
    # compiled executable (smoke: it simply runs; compile-time assertions
    # are not portable, so we pin the dedup count above instead)
    rng = np.random.default_rng(17)
    eng.caption_tokens([_crop(rng, 4, 4)], adapter='b')


def test_adapter_site_out_of_range_rejected(engine):
    '''An adapter finetuned from a DEEPER model must be rejected, not
    silently part-applied (list indexes past the served layer stack).'''
    sites = _adapter_sites()
    site, leaves = next(iter(sites.items()))
    deep_site = site.replace('/layers/0/', '/layers/9/')
    assert deep_site != site
    with pytest.raises(ValueError, match='indexes past'):
        engine.add_adapter('deep', {deep_site: leaves})


# ---------------------------------------------------------------------------
# serve_bench script (the DESIGN §7a load-measurement tool)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_serve_bench_smoke_prints_one_json_line():
    '''Drive the REAL serving load benchmark as a subprocess with tiny
    shape overrides on CPU: one JSON line with throughput + latency
    percentile fields for both the base and the multi-tenant phase.'''
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               JAX_PLATFORMS='cpu',
               SERVE_BENCH_VOC='64', SERVE_BENCH_DM='16',
               SERVE_BENCH_MAX_LEN='4', SERVE_BENCH_MAX_BATCH='4',
               SERVE_BENCH_T_LOAD='2', SERVE_BENCH_CLIENTS='4',
               SERVE_BENCH_WINDOWS='2',
               SERVE_BENCH_DEADLINE_MS='60000')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    proc = subprocess.run(
        [sys.executable, '-m', 'bmt_tpu.scripts.serve_bench'], cwd=repo,
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    result = json.loads(lines[0])
    for key in ('batch32_caps_per_sec', 'concurrent_base_caps_per_sec',
                'concurrent_base_caps_per_sec_p50',
                'concurrent_base_latency_ms_p99', 'multi_tenant_caps_per_sec',
                'multi_tenant_latency_ms_p50',
                'multi_tenant_latency_ms_p99', 'concurrent_base_shed',
                'base_faster_windows'):
        assert key in result, (key, result)
    assert len(result['concurrent_base_caps_per_sec_windows']) == 2
    assert result['concurrent_base_completed'] > 0
    assert result['multi_tenant_completed'] > 0
    assert set(result['engine_stats']['adapters']) == {'cooking', 'sports'}
