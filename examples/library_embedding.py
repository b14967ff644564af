'''Embedding bmt_tpu as a LIBRARY (no HTTP, no CLI): load a checkpoint,
caption ragged feature crops through the bucket-compiled engine, and run
the full two-stage pipeline on one video's features in-process.

Run (tiny synthetic checkpoint, CPU-friendly):
    JAX_PLATFORMS=cpu python examples/library_embedding.py

The same calls work against real checkpoints
(--ckpt dirs produced by main.py --procedure train_cap / train_prop).
'''
import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(1, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp


def _make_tiny_checkpoints(root):
    '''Synthetic cap+prop checkpoints so the example runs out of the box.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.data.vocab import Vocab
    from bmt_tpu.models import (CapModelDims, PropModelDims,
                                init_bimodal_transformer,
                                init_multimodal_proposal_generator)
    from bmt_tpu.train.checkpoint import save_checkpoint

    itos = ['<unk>', '<blank>', '<s>', '</s>', 'a', 'man', 'woman', 'runs',
            'jumps', 'plays', 'the', 'track']
    vocab = Vocab(itos)
    cap_cfg = Config(build_parser().parse_args(
        ['--procedure', 'train_cap', '--d_vid', '32', '--d_aud', '16',
         '--use_linear_embedder', '--d_model_video', '16',
         '--d_model_audio', '12', '--d_model', '24', '--d_model_caps', '10',
         '--H', '2', '--N', '1', '--max_len', '8', '--dont_log']))
    cap_dims = CapModelDims.from_config(cap_cfg, len(vocab))
    save_checkpoint(os.path.join(root, 'cap'),
                    init_bimodal_transformer(jax.random.PRNGKey(0),
                                             cap_dims),
                    {'config': cap_cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': vocab.itos})

    prop_cfg = Config(build_parser().parse_args(
        ['--procedure', 'train_prop', '--d_vid', '32', '--d_aud', '16',
         '--use_linear_embedder', '--d_model_video', '16',
         '--d_model_audio', '12', '--d_model', '24', '--H', '2', '--N', '1',
         '--anchors_num_audio', '2', '--anchors_num_video', '2',
         '--kernel_sizes_audio', '3', '--kernel_sizes_video', '3',
         '--conv_layers_audio', '8', '--conv_layers_video', '8',
         '--pad_audio_feats_up_to', '32', '--pad_video_feats_up_to', '16',
         '--max_prop_per_vid', '3', '--dont_log']))
    prop_params = init_multimodal_proposal_generator(
        jax.random.PRNGKey(1), PropModelDims.from_config(prop_cfg))
    prop_params['anchors_A'] = jnp.asarray([2.0, 6.0])
    prop_params['anchors_V'] = jnp.asarray([3.0, 9.0])
    save_checkpoint(os.path.join(root, 'prop'), prop_params,
                    {'config': prop_cfg.to_dict(), 'epoch': 0},
                    name='best_prop_model')
    return os.path.join(root, 'cap'), os.path.join(root, 'prop')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cap_ckpt', default=None,
                    help='native cap checkpoint dir (default: tiny synthetic)')
    ap.add_argument('--prop_ckpt', default=None)
    args = ap.parse_args()

    from bmt_tpu.serve import CaptionEngine, MicroBatcher, VideoPipeline
    from bmt_tpu.train.checkpoint import (load_cap_checkpoint,
                                          load_prop_checkpoint)

    tmp = None
    if args.cap_ckpt is None:
        tmp = tempfile.mkdtemp()
        args.cap_ckpt, args.prop_ckpt = _make_tiny_checkpoints(tmp)

    # 1) the captioning engine: ragged crops in, sentences out
    cfg, dims, params, vocab = load_cap_checkpoint(args.cap_ckpt)
    engine = CaptionEngine(params, dims, vocab, max_len=cfg.max_len,
                           max_batch=8, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)

    def crop(sv, sa):
        return {'rgb': rng.normal(size=(sv, dims.d_vid)).astype(np.float32),
                'flow': rng.normal(size=(sv, dims.d_vid)).astype(np.float32),
                'audio': rng.normal(size=(sa, dims.d_aud)).astype(np.float32)}

    sentences = engine.caption_crops([crop(5, 7), crop(9, 12), crop(3, 4)])
    print('engine.caption_crops ->')
    for s in sentences:
        print('  ', repr(s))

    # 2) concurrent callers coalesce through the MicroBatcher
    batcher = MicroBatcher(engine, max_wait_ms=5.0)
    futs = [batcher.submit(crop(6, 8)) for _ in range(4)]
    print('micro-batched ->', [type(f.result(timeout=120)).__name__
                               for f in futs])
    batcher.close()

    # 3) the full two-stage pipeline on one video's full features
    if args.prop_ckpt:
        prop_cfg, prop_dims, prop_params = load_prop_checkpoint(
            args.prop_ckpt, max_prop_per_vid=3)
        pipe = VideoPipeline(engine, prop_params, prop_dims, prop_cfg)
        feats = crop(12, 20)
        results = pipe.predict(feats, duration=30.0)
        print('pipeline.predict ->')
        for r in results:
            print('  ', r)


if __name__ == '__main__':
    main()
