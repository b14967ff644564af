'''Caption learned proposals and score them — the paper's headline pipeline
(reference: scripts/eval_on_learned_props.py:14-135).

Flow: proposals JSON -> tsv meta (filtering unavailable videos) ->
'learned_props' captioning dataset (features re-cropped per proposal) ->
batched KV-cached greedy decode -> submission JSON -> densevid scoring vs
both val refs at tIoUs [0.3, 0.5, 0.7, 0.9].
'''
from __future__ import annotations

import json
import os

import jax

from bmt_tpu.config import Config
from bmt_tpu.data.captioning import CaptioningDataset
from bmt_tpu.decode import (make_bimodal_beam_fn, make_bimodal_greedy_fn,
                            make_bimodal_sample_fn)
from bmt_tpu.models import CapModelDims
from bmt_tpu.train.checkpoint import (import_cap_model, load_model_params,
                                      load_torch_checkpoint)
from bmt_tpu.train.loops import validation_1by1


def convert_props_in_json_to_csv(prop_pred_path: str, val_1_json_path: str,
                                 avail_mp4_path: str) -> str:
    '''Proposal predictions JSON -> tab-separated meta file
    (reference: eval_on_learned_props.py:14-72).'''
    assert 'val_1' in val_1_json_path, f'Is it the val_1 json: {val_1_json_path}'
    pred_csv_path = prop_pred_path.replace('.json', '.csv')
    if os.path.exists(pred_csv_path):
        print(f'File {pred_csv_path} already exists. I will use it.')
        return pred_csv_path

    with open(prop_pred_path) as f:
        pred_json = json.load(f)['results']
    with open(val_1_json_path) as f:
        vid2duration = {vid: v['duration']
                        for vid, v in json.load(f).items()}
    with open(avail_mp4_path) as f:
        avail = {line.strip().replace('.mp4', '') for line in f}

    rows = []
    idx = 0
    for video_id, props in pred_json.items():
        if video_id not in avail or video_id not in vid2duration:
            continue
        for prop in props:
            start, end = prop['timestamp']
            rows.append((video_id, 'PLACEHOLDER', start, end,
                         vid2duration[video_id], 'val_1', idx))
            idx += 1

    with open(pred_csv_path, 'w') as f:
        f.write('video_id\tcaption_pred\tstart\tend\tduration\tphase\tidx\n')
        for r in rows:
            f.write('\t'.join(str(x) for x in r) + '\n')
    return pred_csv_path


def eval_on_learned_props(args_cfg: Config):
    '''reference: eval_on_learned_props.py:85-135. args_cfg carries the CLI
    args; the model config comes from the checkpoint.'''
    from bmt_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    path = args_cfg.pretrained_cap_model_path

    ckpt_vocab = None
    if path.endswith('.pt'):
        cpt = load_torch_checkpoint(path)
        # dispatch on the state-dict layout like load_cap_checkpoint: the
        # uni-modal ablation captioners embed captions as 'trg_emb'
        sd_keys = cpt['model_state_dict'].keys()
        if any(k.split('module.', 1)[-1].startswith('trg_emb.')
               for k in sd_keys):
            from bmt_tpu.train.checkpoint import import_unimodal_cap_model
            params, cfg_dict = import_unimodal_cap_model(cpt)
        else:
            params, cfg_dict = import_cap_model(cpt)
        epoch = cpt.get('epoch', 0)
    else:
        from bmt_tpu.train.checkpoint import read_checkpoint_meta
        meta = read_checkpoint_meta(path, 'best_cap_model')
        cfg_dict, epoch = meta['config'], meta.get('epoch', 0)
        params = None  # loaded below once the template exists
        # decode with the vocab the checkpoint was TRAINED with: rebuilding
        # from the CLI's train meta could yield a same-size vocab with
        # different token order -> silently garbled captions
        if meta.get('vocab_itos'):
            from bmt_tpu.data.vocab import Vocab
            ckpt_vocab = Vocab(meta['vocab_itos'])

    cfg = Config.from_dict({**cfg_dict})
    # CLI overrides (reference: eval_on_learned_props.py:88-95)
    cfg.max_prop_per_vid = args_cfg.max_prop_per_vid
    cfg.log_path = os.path.split(path)[0] if path.endswith('.pt') else path
    cfg.train_meta_path = args_cfg.train_meta_path
    cfg.val_1_meta_path = args_cfg.val_1_meta_path
    cfg.val_2_meta_path = args_cfg.val_2_meta_path
    cfg.reference_paths = args_cfg.reference_paths
    cfg.tIoUs = args_cfg.tIoUs
    cfg.avail_mp4_path = args_cfg.avail_mp4_path
    if 'audio' in cfg.modality:
        cfg.audio_features_path = args_cfg.audio_features_path
        assert os.path.exists(cfg.audio_features_path)
    if 'video' in cfg.modality:
        cfg.video_features_path = args_cfg.video_features_path
        assert os.path.exists(cfg.video_features_path)

    # the reference passes reference_paths[0] (val_1_no_missings.json) as the
    # duration source verbatim (eval_on_learned_props.py:102-104)
    cfg.val_prop_meta_path = convert_props_in_json_to_csv(
        args_cfg.prop_pred_path, cfg.reference_paths[0], cfg.avail_mp4_path)
    print(cfg.log_path)

    # only the VOCABULARY is needed from the train split — building the
    # full train dataset would tokenize+pre-encode ~50k captions at
    # startup for nothing (same optimization as prop_trainer.py:49-58);
    # the checkpoint's own vocab wins when present (token-order safety)
    if ckpt_vocab is None:
        from bmt_tpu.data.vocab import build_vocab_from_meta
        ckpt_vocab = build_vocab_from_meta(
            cfg.train_meta_path, cfg.start_token, cfg.end_token,
            cfg.pad_token, cfg.min_freq_caps)
    pred_prop_ds = CaptioningDataset(cfg, 'learned_props', vocab=ckpt_vocab)
    print(f'Loader will use: {pred_prop_ds.meta_path}')

    dims = CapModelDims.from_config(cfg, pred_prop_ds.trg_voc_size)
    if params is None:
        from bmt_tpu.models import (init_bimodal_transformer,
                                    init_unimodal_transformer)
        init_fn = (init_bimodal_transformer
                   if cfg.modality == 'audio_video'
                   else init_unimodal_transformer)
        template = init_fn(jax.random.PRNGKey(0), dims)
        params = load_model_params(path, 'best_cap_model', template)

    ds = pred_prop_ds
    if getattr(args_cfg, 'decode_strategy', 'greedy') == 'beam':
        # make_bimodal_beam_fn dispatches by dims.modality internally
        greedy_fn = make_bimodal_beam_fn(
            dims, cfg.max_len, ds.start_idx, ds.end_idx,
            ds.pad_idx, args_cfg.beam_size, args_cfg.length_penalty,
            getattr(cfg, 'attention_impl', 'xla'),
            getattr(args_cfg, 'kv_cache_int8', False))
    elif getattr(args_cfg, 'decode_strategy', 'greedy') == 'sample':
        # dispatches by dims.modality internally too
        greedy_fn = make_bimodal_sample_fn(
            dims, cfg.max_len, ds.start_idx, ds.end_idx,
            ds.pad_idx, args_cfg.temperature,
            getattr(args_cfg, 'sample_top_k', 0),
            getattr(args_cfg, 'sample_top_p', 1.0),
            getattr(cfg, 'attention_impl', 'xla'),
            getattr(args_cfg, 'kv_cache_int8', False))
    elif cfg.modality == 'audio_video':
        greedy_fn = make_bimodal_greedy_fn(
            dims, cfg.max_len, ds.start_idx, ds.end_idx,
            ds.pad_idx, getattr(cfg, 'attention_impl', 'xla'),
            getattr(args_cfg, 'kv_cache_int8', False))
    else:
        # uni-modal ablation checkpoints decode through the uni-modal
        # KV-cached greedy loop (same dispatch as cap_trainer)
        from bmt_tpu.decode import make_unimodal_greedy_fn
        greedy_fn = make_unimodal_greedy_fn(
            dims, cfg.max_len, ds.start_idx, ds.end_idx,
            ds.pad_idx, getattr(cfg, 'attention_impl', 'xla'),
            getattr(args_cfg, 'kv_cache_int8', False))

    # decode dtype follows the CHECKPOINT's training config (imported
    # reference .pt checkpoints carry no compute_dtype -> fp32, the
    # parity-safe choice); features sharded over the dp mesh so the
    # headline eval decodes on every chip
    import jax.numpy as jnp
    from bmt_tpu.parallel import DataParallel
    from bmt_tpu.train.loops import make_decode_fn
    from bmt_tpu.train.steps import cast_tree
    compute_dtype = (jnp.bfloat16
                     if getattr(cfg, 'compute_dtype', 'float32') == 'bfloat16'
                     else jnp.float32)
    dp = DataParallel(getattr(args_cfg, 'dp_devices', None))
    if getattr(args_cfg, 'weights_int8', False):
        # quantize AFTER the dtype cast and BEFORE replication, so the
        # mesh carries the int8 tree (ops/quant.py; scales stay f32)
        from bmt_tpu.ops.quant import quantize_tree_int8
        params = quantize_tree_int8(cast_tree(params, compute_dtype))
        decode_params = dp.replicate_tree(params)
    else:
        decode_params = cast_tree(dp.replicate_tree(params), compute_dtype)
    decode_fn = make_decode_fn(greedy_fn, dp, compute_dtype)

    metrics = validation_1by1(cfg, decode_params, decode_fn, pred_prop_ds,
                              epoch, logger=None, phase='learned_props')
    print(metrics)
    return metrics
