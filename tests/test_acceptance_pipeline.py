'''End-to-end test of the one-command acceptance pipeline
(bmt_tpu/scripts/acceptance.py) on synthetic stand-ins.

The real acceptance targets — the reference's published checkpoints and
ActivityNet features (reference: README.md:64-92, 173-185) — are
unfetchable from this host, so this drives the WHOLE chain on tiny
trained models over the synthetic mini_data tree instead:

  md5            SKIPs for native checkpoints (published md5s cover the
                 reference .pt files only);
  import         native checkpoint meta loads;
  gt_val         re-measures METEOR on ground-truth proposals and
                 compares against the metrics the trainer embedded in
                 the checkpoint — greedy decode is deterministic, so the
                 re-measured value must MATCH the embedded one exactly,
                 which exercises the same comparison the real
                 acceptance makes at tol 0.1;
  learned_props  prop model -> proposals json -> eval_on_learned_props;
  sample         the single-video CLI vs a golden JSON produced by an
                 identical direct run (deterministic -> must match).

The day the real assets land, the identical command line (with the .pt
paths and without --skip-like overrides) runs the true acceptance.
'''
import json
import os

import numpy as np
import pytest

from tests.test_drivers import mini_data, _mini_cfg, D_VID, D_AUD  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_acceptance_pipeline_on_standins(mini_data, tmp_path):  # noqa: F811
    from bmt_tpu.scripts.acceptance import main as acceptance_main
    from bmt_tpu.train.cap_trainer import train_cap
    from bmt_tpu.train.prop_trainer import train_prop

    os.chdir(tmp_path)
    cap_cfg = _mini_cfg(mini_data, tmp_path, 'train_cap')
    train_cap(cap_cfg)
    prop_cfg = _mini_cfg(mini_data, tmp_path, 'train_prop')
    train_prop(prop_cfg)

    # stand-in for the bundled women_long_jump features, at mini dims
    rng = np.random.default_rng(3)
    sample_dir = tmp_path / 'sample'
    sample_dir.mkdir()
    np.save(sample_dir / 'women_long_jump_rgb.npy',
            rng.normal(size=(11, D_VID)).astype(np.float32))
    np.save(sample_dir / 'women_long_jump_flow.npy',
            rng.normal(size=(11, D_VID)).astype(np.float32))
    np.save(sample_dir / 'women_long_jump_vggish.npy',
            rng.normal(size=(13, D_AUD)).astype(np.float32))

    # golden for the sample stage: one direct run of the identical CLI
    # (deterministic greedy decode -> the acceptance re-run must match)
    from bmt_tpu.scripts.acceptance import run_sample

    class _SampleArgs:
        train_meta_path = str(mini_data / 'train.csv')
    bootstrap = tmp_path / 'bootstrap_expected.json'
    bootstrap.write_text('[]')
    probe = run_sample(_SampleArgs, cap_cfg.model_checkpoint_path,
                       prop_cfg.log_path, str(sample_dir),
                       expected_path=str(bootstrap), duration=21.5,
                       out_dir=str(tmp_path / 'golden'))
    assert 'predicted' in probe, probe
    expected_json = tmp_path / 'expected_sample.json'
    with open(expected_json, 'w') as f:
        json.dump(probe['predicted'], f)

    report_path = tmp_path / 'acceptance_report.json'
    rc = acceptance_main([
        '--procedure', 'evaluate',
        '--pretrained_cap_model_path', cap_cfg.model_checkpoint_path,
        '--pretrained_prop_model_path', prop_cfg.log_path,
        '--train_meta_path', str(mini_data / 'train.csv'),
        '--val_1_meta_path', str(mini_data / 'val_1.csv'),
        '--val_2_meta_path', str(mini_data / 'val_2.csv'),
        '--video_features_path', str(mini_data / 'video_npy'),
        '--audio_features_path', str(mini_data / 'audio_npy'),
        '--reference_paths', str(mini_data / 'val_1_no_missings.json'),
        str(mini_data / 'val_2_no_missings.json'),
        '--avail_mp4_path', str(mini_data / 'available_mp4.txt'),
        '--d_vid', str(D_VID), '--d_aud', str(D_AUD),
        '--log_dir', str(tmp_path / 'acc_log'),
        '--max_prop_per_vid', '10',
        '--sample_dir', str(sample_dir),
        '--expected_sample', str(expected_json),
        '--sample_duration', '21.5',
        '--report_path', str(report_path),
    ])
    assert rc == 0

    with open(report_path) as f:
        report = json.load(f)
    stages = report['stages']
    assert set(stages) == {'md5', 'import', 'gt_val', 'learned_props',
                           'sample'}
    # native checkpoints: published md5s do not apply
    assert stages['md5']['status'] == 'SKIP'
    assert stages['import']['status'] == 'PASS'

    # deterministic greedy decode: the re-measured METEOR must equal the
    # value the trainer embedded when it saved best_cap_model
    gt = stages['gt_val']
    assert gt['status'] == 'PASS', gt
    assert gt['embedded_avg_meteor'] is not None
    assert abs(gt['measured_avg_meteor'] - gt['embedded_avg_meteor']) < 1e-9

    lp = stages['learned_props']
    assert lp['status'] == 'PASS', lp
    assert 'learned_props_meteor' in lp
    assert os.path.exists(lp['prop_pred_path'])

    sm = stages['sample']
    assert sm['status'] == 'PASS', sm
    assert report['overall'] == 'PASS'

    # ---- the .pt route: export both stand-ins to reference format and
    # run the cheap stages against them -------------------------------------
    from bmt_tpu.scripts.export import main as export_main
    cap_pt = str(tmp_path / 'best_cap_model.pt')
    prop_pt = str(tmp_path / 'best_prop_model.pt')
    export_main(['--checkpoint', cap_cfg.model_checkpoint_path,
                 '--out', cap_pt])
    export_main(['--checkpoint', prop_cfg.log_path, '--model', 'prop',
                 '--out', prop_pt])

    common = [
        '--procedure', 'evaluate',
        '--pretrained_cap_model_path', cap_pt,
        '--pretrained_prop_model_path', prop_pt,
        '--train_meta_path', str(mini_data / 'train.csv'),
        '--val_1_meta_path', str(mini_data / 'val_1.csv'),
        '--val_2_meta_path', str(mini_data / 'val_2.csv'),
        '--video_features_path', str(mini_data / 'video_npy'),
        '--audio_features_path', str(mini_data / 'audio_npy'),
        '--reference_paths', str(mini_data / 'val_1_no_missings.json'),
        str(mini_data / 'val_2_no_missings.json'),
        '--avail_mp4_path', str(mini_data / 'available_mp4.txt'),
        '--d_vid', str(D_VID), '--d_aud', str(D_AUD),
        '--log_dir', str(tmp_path / 'acc_pt_log'),
        '--report_path', str(tmp_path / 'pt_report.json'),
    ]
    # stand-in .pt files are NOT the published checkpoints: the md5 gate
    # must FAIL (and fail the overall verdict)
    rc = acceptance_main(common + ['--acceptance_stages', 'md5'])
    assert rc == 1
    with open(tmp_path / 'pt_report.json') as f:
        assert json.load(f)['stages']['md5']['status'] == 'FAIL'

    # with --skip_md5, the .pt import stage passes and surfaces the
    # checkpoint-embedded METEOR the gt_val stage would compare against
    rc = acceptance_main(common + ['--acceptance_stages', 'md5,import',
                                   '--skip_md5'])
    assert rc == 0
    with open(tmp_path / 'pt_report.json') as f:
        pt_stages = json.load(f)['stages']
    assert pt_stages['md5']['status'] == 'SKIP'
    assert pt_stages['import']['status'] == 'PASS'
    assert pt_stages['import']['cap_params'] > 0
    assert pt_stages['import']['cap_embedded_avg_meteor'] == pytest.approx(
        gt['embedded_avg_meteor'])


def test_acceptance_stage_selection_and_md5(tmp_path):
    '''Unit-level checks that need no trained models: unknown stage names
    are rejected; the md5 stage FAILs on wrong-content .pt files and
    SKIPs under --skip_md5.'''
    import argparse

    from bmt_tpu.scripts.acceptance import run_acceptance

    cap = tmp_path / 'best_cap_model.pt'
    prop = tmp_path / 'best_prop_model.pt'
    cap.write_bytes(b'not the reference checkpoint')
    prop.write_bytes(b'also not')

    def _args(**kw):
        ns = argparse.Namespace(
            pretrained_cap_model_path=str(cap),
            pretrained_prop_model_path=str(prop),
            acceptance_stages='md5', skip_md5=False,
            meteor_tol=0.1, expected_meteor=None, log_dir=str(tmp_path),
        )
        for k, v in kw.items():
            setattr(ns, k, v)
        return ns

    report = run_acceptance(_args())
    assert report['stages']['md5']['status'] == 'FAIL'
    assert report['overall'] == 'FAIL'

    report = run_acceptance(_args(skip_md5=True))
    assert report['stages']['md5']['status'] == 'SKIP'
    assert report['overall'] == 'SKIP'

    with pytest.raises(SystemExit, match='unknown acceptance stages'):
        run_acceptance(_args(acceptance_stages='md5,frobnicate'))
