'''Caption-serving CLI: load a captioning checkpoint, warm the shape grid,
serve HTTP.

    python -m bmt_tpu.scripts.serve \
        --pretrained_cap_model_path ./ckpts  (npz dir or reference .pt) \
        --port 8000 [--train_meta_path data/train.csv for .pt vocabs]

API:
    POST /caption  {"features": {"rgb": [[..]], "flow": [[..]],
                                 "audio": [[..]]}}  -> {"sentence": "..."}
    GET  /healthz  -> {"status": "ok"}
    GET  /stats    -> batching counters

The reference has no serving path (its closest surface is the one-shot
sample/single_video_prediction.py CLI); this is a beyond-reference
subsystem built on the same checkpoint/vocab machinery.
'''
from __future__ import annotations

import argparse

import jax.numpy as jnp

from bmt_tpu.serve import CaptionEngine, CaptionHTTPServer
from bmt_tpu.train.checkpoint import load_cap_checkpoint
from bmt_tpu.utils.misc import enable_compile_cache


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--pretrained_cap_model_path', required=True)
    p.add_argument('--train_meta_path', default='./data/train.csv')
    p.add_argument('--allow_vocab_drift', action='store_true',
                   help='serve even when the rebuilt vocabulary size '
                        'differs from the checkpoint embedding table')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--max_batch', type=int, default=64)
    p.add_argument('--max_wait_ms', type=float, default=5.0)
    p.add_argument('--max_queue', type=int, default=1024,
                   help='admission-queue bound; past it requests get 503 '
                        '(load sheds at the edge instead of buffering '
                        'unboundedly)')
    p.add_argument('--deadline_ms', type=float, default=None,
                   help='queue-age deadline: requests older than this at '
                        'drain time are shed with 504 instead of decoded, '
                        'bounding p99 by policy (deadline + one decode) '
                        'rather than by queue growth')
    p.add_argument('--attention_impl', default='xla',
                   choices=['xla', 'pallas'])
    p.add_argument('--kv_cache_int8', action='store_true')
    p.add_argument('--weights_int8', action='store_true',
                   help='weight-only int8 decode (per-channel scales, '
                        'int8 MXU matmuls) — halves weight HBM traffic; '
                        'small logit quantization noise')
    p.add_argument('--compute_dtype', default='bfloat16',
                   choices=['bfloat16', 'float32'])
    p.add_argument('--warmup_shapes', default='96x256',
                   help='comma-separated SvxSa pairs to precompile '
                        '(default: the dominant val_1 decode shape)')
    p.add_argument('--warmup_batches', default='1,2,4,8,16,32,64',
                   help='every batch bucket <= max_batch, so steady '
                        'state never compiles')
    p.add_argument('--dp_devices', type=int, default=1,
                   help='shard decode batches over a data-parallel mesh '
                        'of this many chips')
    p.add_argument('--decode_strategy', default='greedy',
                   choices=['greedy', 'beam', 'sample'])
    p.add_argument('--beam_size', type=int, default=4)
    p.add_argument('--length_penalty', type=float, default=0.0)
    p.add_argument('--temperature', type=float, default=1.0)
    p.add_argument('--sample_top_k', type=int, default=0)
    p.add_argument('--sample_top_p', type=float, default=1.0)
    p.add_argument('--seed', type=int, default=0,
                   help='sampling PRNG seed')
    p.add_argument('--lora_adapter', action='append', default=[],
                   metavar='NAME=CKPT',
                   help='register a LoRA finetune for per-request '
                        'selection ({"adapter": NAME} in POST /caption); '
                        'repeatable — all adapters share the one frozen '
                        'base in HBM, each costs only its rank-r deltas. '
                        'CKPT: a --lora_rank checkpoint dir or params.npz')
    p.add_argument('--prop_generator_model_path', default=None,
                   help='also load a proposal checkpoint and expose the '
                        'full two-stage pipeline at POST /predict')
    p.add_argument('--max_prop_per_vid', type=int, default=100)
    p.add_argument('--nms_tiou_thresh', type=float, default=None)
    return p


def main(argv=None, block=True):
    '''Start the server. ``block=False`` returns the (running-ready)
    CaptionHTTPServer instead of serving forever — used by tests and by
    embedding applications.'''
    args = build_parser().parse_args(argv)
    enable_compile_cache()
    cfg, dims, params, vocab = load_cap_checkpoint(
        args.pretrained_cap_model_path, args.train_meta_path,
        allow_vocab_drift=args.allow_vocab_drift)
    if cfg.modality != 'audio_video':
        raise SystemExit(
            f'serving supports the bi-modal captioner only (checkpoint '
            f'modality: {cfg.modality}); decode uni-modal ablation '
            f'checkpoints via main.py --procedure evaluate instead')
    dp = None
    if args.dp_devices > 1:
        from bmt_tpu.parallel import DataParallel
        try:
            dp = DataParallel(args.dp_devices)
        except ValueError as e:
            raise SystemExit(f'--dp_devices {args.dp_devices}: {e}')
        print(f'decode batches sharded over dp{dp.n_dp}')
    decode_fn = None
    se = vocab[cfg.start_token], vocab[cfg.end_token], vocab[cfg.pad_token]
    if args.decode_strategy == 'beam':
        from bmt_tpu.decode import make_bimodal_beam_fn
        decode_fn = make_bimodal_beam_fn(
            dims, cfg.max_len, *se, args.beam_size, args.length_penalty,
            args.attention_impl, args.kv_cache_int8)
    elif args.decode_strategy == 'sample':
        from bmt_tpu.decode import make_bimodal_sample_fn
        decode_fn = make_bimodal_sample_fn(
            dims, cfg.max_len, *se, args.temperature, args.sample_top_k,
            args.sample_top_p, args.attention_impl, args.kv_cache_int8,
            seed=args.seed)
    engine = CaptionEngine(
        params, dims, vocab, max_len=cfg.max_len,
        start_token=cfg.start_token, end_token=cfg.end_token,
        pad_token=cfg.pad_token, max_batch=args.max_batch,
        attention_impl=args.attention_impl, kv_int8=args.kv_cache_int8,
        weights_int8=args.weights_int8,
        compute_dtype=jnp.bfloat16
        if args.compute_dtype == 'bfloat16' else None, dp=dp,
        decode_fn=decode_fn)
    if decode_fn is not None:
        print(f'decode strategy: {args.decode_strategy}')

    for spec in args.lora_adapter:
        if '=' not in spec:
            raise SystemExit(
                f'--lora_adapter {spec!r}: expected NAME=CKPT_PATH')
        name, ckpt = spec.split('=', 1)
        from bmt_tpu.train.checkpoint import load_lora_sites
        n_sites = engine.add_adapter(name, load_lora_sites(ckpt))
        print(f'adapter {name!r}: {n_sites} adapted linears from {ckpt}')

    shapes = [tuple(int(x) for x in s.split('x'))
              for s in args.warmup_shapes.split(',') if s]
    batches = [int(b) for b in args.warmup_batches.split(',') if b]
    # max_batch's bucket must always be in the warmup set (a saturated
    # burst maps to it immediately; CaptionEngine.warmup's own default
    # unions it too) — otherwise --max_batch above the listed buckets
    # compiles for seconds inside the first loaded request
    if args.max_batch not in batches:
        batches.append(args.max_batch)
    n = engine.warmup(batch_sizes=batches, shapes=shapes)
    print(f'warmed {n} executables over shapes={shapes} batches={batches}')

    pipeline = None
    if args.prop_generator_model_path:
        from bmt_tpu.serve import VideoPipeline
        from bmt_tpu.train.checkpoint import load_prop_checkpoint
        prop_cfg, prop_dims, prop_params = load_prop_checkpoint(
            args.prop_generator_model_path, args.max_prop_per_vid)
        pipeline = VideoPipeline(engine, prop_params, prop_dims, prop_cfg,
                                 nms_tiou=args.nms_tiou_thresh)
        print(f'two-stage pipeline enabled at /predict '
              f'(max {args.max_prop_per_vid} proposals/video)')

    server = CaptionHTTPServer((args.host, args.port), engine,
                               max_wait_ms=args.max_wait_ms,
                               pipeline=pipeline, max_queue=args.max_queue,
                               deadline_ms=args.deadline_ms)
    print(f'serving on http://{args.host}:{server.server_address[1]}')
    if not block:
        return server
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == '__main__':
    main()
