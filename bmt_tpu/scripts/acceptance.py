'''One-command acceptance pipeline against the reference's published
checkpoints (reference: README.md:64-92, 173-185).

The day `best_cap_model.pt` / `best_prop_model.pt` and the features land
on a host with this repo, ONE command executes the whole acceptance
chain and prints a PASS/FAIL report:

    python -m bmt_tpu.scripts.acceptance \
        --procedure evaluate \
        --pretrained_cap_model_path  /path/best_cap_model.pt \
        --pretrained_prop_model_path /path/best_prop_model.pt \
        --video_features_path data/i3d_25fps_stack64step64_2stream_npy \
        --audio_features_path data/vggish_npy \
        --report_path acceptance_report.json

Stages (each independently PASS/FAIL/SKIP; --acceptance_stages selects):

  md5            checkpoint md5s match the reference README's published
                 hashes (cap 7b4d48…, prop 5f8b20…); SKIP with --skip_md5
                 (stand-in fixtures) or for native npz checkpoints.
  import         both checkpoints import into this framework's params.
  gt_val         captioning on GROUND-TRUTH proposals over val_1+val_2
                 (reference README.md:81-88): measured average METEOR must
                 be within --meteor_tol (default 0.1) of the checkpoint's
                 own embedded val_1_metrics/val_2_metrics average. When
                 the checkpoint embeds no metrics (stand-ins) the measured
                 values are reported and the comparison SKIPs unless
                 --expected_meteor is given.
  learned_props  generate proposals with the prop model on val_1
                 (validate_prop -> prop_results json), then caption+score
                 them via eval_on_learned_props (reference
                 README.md:89-92); reports METEOR across the 4 tIoUs.
  sample         the golden single-video check (reference
                 README.md:173-185): run sample/single_video_prediction.py
                 on the bundled women_long_jump features with both models
                 and compare segments against --expected_sample
                 (default sample/expected_women_long_jump.json, the
                 README's published output).

Everything offline-verifiable in this chain is already covered by unit
tests; this script is the LAST-MILE automation so absolute-parity
acceptance is a data drop-in, not an engineering task. The whole flow is
driven end-to-end on synthetic stand-ins by
tests/test_acceptance_pipeline.py.
'''
from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

CAP_MD5 = '7b4d48cd77ec49a027a4a1abc6867ee7'    # reference README.md:64
PROP_MD5 = '5f8b20826b09eadd41b7a5be662c198b'   # reference README.md:71
ALL_STAGES = ('md5', 'import', 'gt_val', 'learned_props', 'sample')


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()


def _avg_meteor(val_1_metrics, val_2_metrics):
    '''The reference's headline: average the two val dicts
    (utilities/captioning_utils.py:12-25 semantics, METEOR row).'''
    m1 = val_1_metrics['Average across tIoUs']['METEOR']
    m2 = val_2_metrics['Average across tIoUs']['METEOR']
    return (m1 + m2) / 2


def _load_cap(path: str):
    '''-> (params, cfg_dict, epoch, vocab_or_None, embedded_metrics).'''
    from bmt_tpu.train.checkpoint import (import_cap_model,
                                          load_torch_checkpoint)
    if path.endswith('.pt'):
        cpt = load_torch_checkpoint(path)
        params, cfg_dict = import_cap_model(cpt)
        embedded = None
        if cpt.get('val_1_metrics') and cpt.get('val_2_metrics'):
            embedded = _avg_meteor(cpt['val_1_metrics'],
                                   cpt['val_2_metrics'])
        return params, cfg_dict, cpt.get('epoch', 0), None, embedded
    # native checkpoint dir / file
    from bmt_tpu.train.checkpoint import read_checkpoint_meta
    ckpt_dir = path if os.path.isdir(path) else os.path.dirname(path)
    meta = read_checkpoint_meta(ckpt_dir, 'best_cap_model')
    vocab = None
    if meta.get('vocab_itos'):
        from bmt_tpu.data.vocab import Vocab
        vocab = Vocab(meta['vocab_itos'])
    embedded = None
    if meta.get('val_1_metrics') and meta.get('val_2_metrics'):
        embedded = _avg_meteor(meta['val_1_metrics'], meta['val_2_metrics'])
    return None, meta['config'], meta.get('epoch', 0), vocab, embedded


def _decode_assembly(cfg, dims, ds, args_cfg):
    '''greedy decode fn + replicated params placement, the exact assembly
    eval_on_learned_props uses.'''
    import jax.numpy as jnp

    from bmt_tpu.decode import make_bimodal_greedy_fn
    from bmt_tpu.parallel import DataParallel
    from bmt_tpu.train.loops import make_decode_fn
    from bmt_tpu.train.steps import cast_tree
    greedy_fn = make_bimodal_greedy_fn(
        dims, cfg.max_len, ds.start_idx, ds.end_idx, ds.pad_idx,
        getattr(cfg, 'attention_impl', 'xla'))
    compute_dtype = (jnp.bfloat16
                     if getattr(cfg, 'compute_dtype', 'float32') == 'bfloat16'
                     else jnp.float32)
    dp = DataParallel(getattr(args_cfg, 'dp_devices', None))
    return make_decode_fn(greedy_fn, dp, compute_dtype), dp, compute_dtype, \
        cast_tree


def run_gt_val(args_cfg, cap_path: str, tol: float,
               expected_meteor=None) -> dict:
    '''Captioning on ground-truth proposals, both val splits, vs the
    checkpoint's embedded metrics (reference README.md:81-88).'''
    import jax

    from bmt_tpu.config import Config
    from bmt_tpu.data.captioning import CaptioningDataset
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    from bmt_tpu.train.loops import validation_1by1

    params, cfg_dict, epoch, vocab, embedded = _load_cap(cap_path)
    cfg = Config.from_dict({**cfg_dict})
    cfg.train_meta_path = args_cfg.train_meta_path
    cfg.val_1_meta_path = args_cfg.val_1_meta_path
    cfg.val_2_meta_path = args_cfg.val_2_meta_path
    cfg.reference_paths = args_cfg.reference_paths
    cfg.avail_mp4_path = args_cfg.avail_mp4_path
    cfg.video_features_path = args_cfg.video_features_path
    cfg.audio_features_path = args_cfg.audio_features_path
    cfg.log_path = os.path.join(args_cfg.log_dir or './tmp', 'acceptance')
    cfg.max_prop_per_vid = args_cfg.max_prop_per_vid

    if vocab is None:
        from bmt_tpu.data.vocab import build_vocab_from_meta
        vocab = build_vocab_from_meta(
            cfg.train_meta_path, cfg.start_token, cfg.end_token,
            cfg.pad_token, cfg.min_freq_caps)
    val_1 = CaptioningDataset(cfg, 'val_1', vocab=vocab)
    val_2 = CaptioningDataset(cfg, 'val_2', vocab=vocab)
    dims = CapModelDims.from_config(cfg, val_1.trg_voc_size)
    if params is None:
        from bmt_tpu.train.checkpoint import load_model_params
        ckpt_dir = (cap_path if os.path.isdir(cap_path)
                    else os.path.dirname(cap_path))
        template = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
        params = load_model_params(ckpt_dir, 'best_cap_model', template)

    decode_fn, dp, compute_dtype, cast_tree = _decode_assembly(
        cfg, dims, val_1, args_cfg)
    decode_params = cast_tree(dp.replicate_tree(params), compute_dtype)

    m1 = validation_1by1(cfg, decode_params, decode_fn, val_1, epoch,
                         phase='val_1')
    m2 = validation_1by1(cfg, decode_params, decode_fn, val_2, epoch,
                         phase='val_2')
    measured = _avg_meteor(m1, m2)
    target = embedded if embedded is not None else expected_meteor
    out = {
        'measured_avg_meteor': measured,
        'embedded_avg_meteor': embedded,
        'val_1_metrics': m1['Average across tIoUs'],
        'val_2_metrics': m2['Average across tIoUs'],
        'tol': tol,
    }
    if target is None:
        out['status'] = 'SKIP'
        out['detail'] = ('checkpoint embeds no val metrics and no '
                         '--expected_meteor given; measured values reported')
    elif abs(measured - target) <= tol:
        out['status'] = 'PASS'
    else:
        out['status'] = 'FAIL'
        out['detail'] = (f'|{measured:.4f} - {target:.4f}| > {tol}')
    return out


def run_learned_props(args_cfg, prop_path: str, cap_path: str) -> dict:
    '''Prop model -> proposals json on val_1 -> caption+score
    (reference README.md:89-92 / eval_on_learned_props).'''
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bmt_tpu.config import Config
    from bmt_tpu.data.proposal_data import ProposalDataset
    from bmt_tpu.models import (PropModelDims,
                                init_multimodal_proposal_generator)
    from bmt_tpu.scripts.eval_on_learned_props import eval_on_learned_props
    from bmt_tpu.train.loops import validate_prop
    from bmt_tpu.train.steps import cast_tree, make_prop_inference_step

    # ---- import the proposal model -------------------------------------
    if prop_path.endswith('.pt'):
        from bmt_tpu.train.checkpoint import (import_prop_model,
                                              load_torch_checkpoint)
        cpt = load_torch_checkpoint(prop_path)
        pparams, pcfg_dict = import_prop_model(cpt)
        epoch = cpt.get('epoch', 0)
    else:
        from bmt_tpu.train.checkpoint import (load_model_params,
                                              read_checkpoint_meta)
        ckpt_dir = (prop_path if os.path.isdir(prop_path)
                    else os.path.dirname(prop_path))
        meta = read_checkpoint_meta(ckpt_dir, 'best_prop_model')
        pcfg_dict, epoch = meta['config'], meta.get('epoch', 0)
        pparams = None

    pcfg = Config.from_dict({**pcfg_dict})
    pcfg.train_meta_path = args_cfg.train_meta_path
    pcfg.val_1_meta_path = args_cfg.val_1_meta_path
    pcfg.val_2_meta_path = args_cfg.val_2_meta_path
    pcfg.avail_mp4_path = args_cfg.avail_mp4_path
    pcfg.video_features_path = args_cfg.video_features_path
    pcfg.audio_features_path = args_cfg.audio_features_path
    pcfg.log_path = os.path.join(args_cfg.log_dir or './tmp',
                                 'acceptance_props')
    pcfg.max_prop_per_vid = args_cfg.max_prop_per_vid
    pcfg.tIoUs = args_cfg.tIoUs

    pdims = PropModelDims.from_config(pcfg)
    if pparams is None:
        template = init_multimodal_proposal_generator(
            jax.random.PRNGKey(0), pdims)
        # anchors ride in the checkpoint; template shapes from config
        template['anchors_A'] = jnp.zeros((pcfg.anchors_num_audio,),
                                          jnp.float32)
        template['anchors_V'] = jnp.zeros((pcfg.anchors_num_video,),
                                          jnp.float32)
        pparams = load_model_params(ckpt_dir, 'best_prop_model', template)

    compute_dtype = (jnp.bfloat16
                     if getattr(pcfg, 'compute_dtype',
                                'float32') == 'bfloat16'
                     else jnp.float32)
    val_ds = ProposalDataset(pcfg, 'val_1', 1)
    inference_step = jax.jit(make_prop_inference_step(
        pdims, 1, getattr(pcfg, 'attention_impl', 'xla'), compute_dtype))
    eval_params = cast_tree(
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), pparams),
        compute_dtype)
    avg_f1, prop_metrics = validate_prop(pcfg, inference_step, eval_params,
                                         val_ds, epoch)

    # validate_prop's AnetPredictions wrote the submission here:
    sub_dir = os.path.join(pcfg.log_path or './tmp', 'submissions')
    cands = sorted(glob.glob(os.path.join(
        sub_dir, f'prop_results_val_1_e{epoch}_maxprop*.json')),
        key=os.path.getmtime)
    if not cands:
        return {'status': 'FAIL',
                'detail': f'no prop_results json produced under {sub_dir}'}
    prop_json = cands[-1]

    # ---- caption + score the learned proposals -------------------------
    eval_cfg = _clone_args(args_cfg)
    eval_cfg.prop_pred_path = prop_json
    eval_cfg.pretrained_cap_model_path = cap_path
    metrics = eval_on_learned_props(eval_cfg)
    avg = metrics['Average across tIoUs']
    return {
        'status': 'PASS',
        'prop_pred_path': prop_json,
        'prop_avg_f1': avg_f1,
        'learned_props_meteor': avg['METEOR'],
        'learned_props_metrics': avg,
    }


def _clone_args(args_cfg):
    import copy
    return copy.copy(args_cfg)


def run_sample(args_cfg, cap_path: str, prop_path: str, sample_dir: str,
               expected_path: str, duration: float, out_dir: str) -> dict:
    '''Golden single-video check (reference README.md:160-185): same CLI,
    bundled features, compare segments to the published expected output.'''
    out_json = os.path.join(out_dir, 'sample_prediction.json')
    os.makedirs(out_dir, exist_ok=True)
    script = os.path.join(os.path.dirname(__file__), '..', '..', 'sample',
                          'single_video_prediction.py')
    cmd = [sys.executable, os.path.abspath(script),
           '--prop_generator_model_path', prop_path,
           '--pretrained_cap_model_path', cap_path,
           '--vggish_features_path',
           os.path.join(sample_dir, 'women_long_jump_vggish.npy'),
           '--rgb_features_path',
           os.path.join(sample_dir, 'women_long_jump_rgb.npy'),
           '--flow_features_path',
           os.path.join(sample_dir, 'women_long_jump_flow.npy'),
           '--duration_in_secs', str(duration),
           '--max_prop_per_vid', '100',
           '--nms_tiou_thresh', '0.4',
           '--train_meta_path', args_cfg.train_meta_path,
           '--output_json', out_json]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    if proc.returncode != 0:
        return {'status': 'FAIL', 'detail': 'CLI failed',
                'stderr': proc.stderr[-2000:]}
    with open(out_json) as f:
        got = json.load(f)
    with open(expected_path) as f:
        want = json.load(f)
    mismatches = []
    if len(got) != len(want):
        mismatches.append(f'{len(got)} segments != expected {len(want)}')
    for i, (g, w) in enumerate(zip(got, want)):
        if g['sentence'].strip() != w['sentence'].strip():
            mismatches.append(
                f'[{i}] sentence {g["sentence"]!r} != {w["sentence"]!r}')
        # boundaries in the README are printed at 0.1s resolution
        for k in ('start', 'end'):
            if abs(float(g[k]) - float(w[k])) > 0.051:
                mismatches.append(f'[{i}] {k} {g[k]} != {w[k]}')
    return {'status': 'PASS' if not mismatches else 'FAIL',
            'predicted': got, 'mismatches': mismatches,
            'output_json': out_json}


def run_acceptance(args_cfg) -> dict:
    stages = [s.strip() for s in
              (args_cfg.acceptance_stages or ','.join(ALL_STAGES)).split(',')]
    bad = set(stages) - set(ALL_STAGES)
    if bad:
        raise SystemExit(f'unknown acceptance stages: {sorted(bad)}; '
                         f'valid: {ALL_STAGES}')
    cap_path = args_cfg.pretrained_cap_model_path
    prop_path = args_cfg.pretrained_prop_model_path
    if not cap_path or not prop_path:
        raise SystemExit('--pretrained_cap_model_path and '
                         '--pretrained_prop_model_path are required')
    report = {'stages': {}}

    if 'md5' in stages:
        if args_cfg.skip_md5:
            report['stages']['md5'] = {
                'status': 'SKIP', 'detail': '--skip_md5 (stand-in fixtures)'}
        elif not (cap_path.endswith('.pt') and prop_path.endswith('.pt')):
            report['stages']['md5'] = {
                'status': 'SKIP',
                'detail': 'published md5s cover the reference .pt files only'}
        else:
            got_cap, got_prop = _md5(cap_path), _md5(prop_path)
            ok = got_cap == CAP_MD5 and got_prop == PROP_MD5
            report['stages']['md5'] = {
                'status': 'PASS' if ok else 'FAIL',
                'cap': {'got': got_cap, 'want': CAP_MD5},
                'prop': {'got': got_prop, 'want': PROP_MD5},
            }

    if 'import' in stages:
        try:
            params, cfg_dict, _, _, embedded = _load_cap(cap_path)
            n_cap = (sum(p.size for p in __import__('jax').tree.leaves(params)
                         if hasattr(p, 'size')) if params is not None
                     else None)
            report['stages']['import'] = {
                'status': 'PASS', 'cap_params': n_cap,
                'cap_embedded_avg_meteor': embedded,
                'cap_config_keys': len(cfg_dict),
            }
        except Exception as e:
            report['stages']['import'] = {
                'status': 'FAIL', 'detail': f'{type(e).__name__}: {e}'}

    if 'gt_val' in stages and \
            report['stages'].get('import', {}).get('status') != 'FAIL':
        try:
            report['stages']['gt_val'] = run_gt_val(
                args_cfg, cap_path, args_cfg.meteor_tol,
                args_cfg.expected_meteor)
        except Exception as e:
            report['stages']['gt_val'] = {
                'status': 'FAIL', 'detail': f'{type(e).__name__}: {e}'}

    if 'learned_props' in stages:
        try:
            report['stages']['learned_props'] = run_learned_props(
                args_cfg, prop_path, cap_path)
        except Exception as e:
            report['stages']['learned_props'] = {
                'status': 'FAIL', 'detail': f'{type(e).__name__}: {e}'}

    if 'sample' in stages:
        repo_root = os.path.abspath(
            os.path.join(os.path.dirname(__file__), '..', '..'))
        sample_dir = args_cfg.sample_dir or os.path.join(repo_root, 'sample')
        expected = args_cfg.expected_sample or os.path.join(
            sample_dir, 'expected_women_long_jump.json')
        try:
            report['stages']['sample'] = run_sample(
                args_cfg, cap_path, prop_path, sample_dir, expected,
                args_cfg.sample_duration,
                os.path.join(args_cfg.log_dir or './tmp', 'acceptance'))
        except Exception as e:
            report['stages']['sample'] = {
                'status': 'FAIL', 'detail': f'{type(e).__name__}: {e}'}

    statuses = [s['status'] for s in report['stages'].values()]
    report['overall'] = ('FAIL' if 'FAIL' in statuses else
                         'PASS' if 'PASS' in statuses else 'SKIP')
    return report


def _print_report(report: dict):
    print('\n===== BMT-TPU acceptance report =====')
    for name, stage in report['stages'].items():
        line = f'  {name:<14} {stage["status"]}'
        if stage.get('detail'):
            line += f'  ({stage["detail"]})'
        if name == 'gt_val' and 'measured_avg_meteor' in stage:
            line += (f'  measured={stage["measured_avg_meteor"]:.4f}'
                     f' embedded={stage["embedded_avg_meteor"]}')
        if name == 'learned_props' and 'learned_props_meteor' in stage:
            line += f'  METEOR={stage["learned_props_meteor"]:.4f}'
        print(line)
    print(f'OVERALL: {report["overall"]}')


def add_acceptance_args(parser):
    parser.add_argument('--meteor_tol', type=float, default=0.1,
                        help='acceptance tolerance on the averaged METEOR '
                             '(reference publishes 2 decimals)')
    parser.add_argument('--expected_meteor', type=float, default=None,
                        help='target METEOR when the checkpoint embeds no '
                             'val metrics (stand-in fixtures)')
    parser.add_argument('--skip_md5', action='store_true')
    parser.add_argument('--acceptance_stages', type=str, default=None,
                        help=f'comma list of {ALL_STAGES} (default: all)')
    parser.add_argument('--sample_dir', type=str, default=None)
    parser.add_argument('--expected_sample', type=str, default=None)
    parser.add_argument('--sample_duration', type=float, default=35.155,
                        help='reference README.md:167')
    parser.add_argument('--report_path', type=str, default=None,
                        help='also write the report as JSON here')
    return parser


def main(argv=None):
    from bmt_tpu.config import Config, build_parser
    parser = add_acceptance_args(build_parser())
    argv = list(sys.argv[1:] if argv is None else argv)
    if '--procedure' not in argv:
        argv = ['--procedure', 'evaluate'] + argv
    args = parser.parse_args(argv)
    args_cfg = Config(args)
    # re-attach the acceptance-only flags (Config copies parser vars, but
    # keep this explicit against future Config filtering)
    for k in ('meteor_tol', 'expected_meteor', 'skip_md5',
              'acceptance_stages', 'sample_dir', 'expected_sample',
              'sample_duration', 'report_path',
              # the 'evaluate' Config branch copies only the cap path
              'pretrained_prop_model_path'):
        setattr(args_cfg, k, getattr(args, k))
    report = run_acceptance(args_cfg)
    _print_report(report)
    if args.report_path:
        with open(args.report_path, 'w') as f:
            json.dump(report, f, indent=1, default=float)
        print(f'report written: {args.report_path}')
    return 0 if report['overall'] != 'FAIL' else 1


if __name__ == '__main__':
    raise SystemExit(main())
