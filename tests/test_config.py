'''Config construction, derived fields (reference parity), serialization.'''
import json

from bmt_tpu.config import Config, build_parser


def _cfg(procedure='train_cap', extra=()):
    argv = ['--procedure', procedure, *extra]
    return Config(build_parser().parse_args(argv))


def test_reference_default_flags():
    '''Spot-check defaults against the reference parser (main.py:29-163).'''
    args = build_parser().parse_args(['--procedure', 'train_cap'])
    assert args.B == 32 and args.inf_B_coeff == 2
    assert args.lr == 5e-5 and args.smoothing == 0.7
    assert args.d_model == 1024 and args.d_model_caps == 300
    assert args.H == 4 and args.N == 2 and args.dout_p == 0.1
    assert args.max_len == 30 and args.min_freq_caps == 1
    assert args.anchors_num_video == 128 and args.anchors_num_audio == 48
    assert args.kernel_sizes_audio == [5, 13, 23, 35, 51, 69, 91, 121, 161, 211]
    assert args.kernel_sizes_video == [1, 5, 9, 13, 19, 25, 35, 45, 61, 79]
    assert args.pad_audio_feats_up_to == 800
    assert args.pad_video_feats_up_to == 300
    assert args.noobj_coeff == 100 and args.obj_coeff == 1
    assert args.tIoUs == [0.3, 0.5, 0.7, 0.9] and args.max_prop_per_vid == 100
    assert args.start_token == '<s>' and args.pad_token == '<blank>'


def test_derived_fields_cap():
    '''d_ff = 4*d_model_* defaults; batch scaling by device count
    (reference: config_constructor.py:86-95).'''
    cfg = _cfg()
    assert cfg.d_model_video == cfg.d_vid == 1024
    assert cfg.d_model_audio == cfg.d_aud == 128
    assert cfg.d_ff_video == 4096 and cfg.d_ff_audio == 512
    assert cfg.d_ff_caps == 1200
    assert cfg.train_batch_size == 32
    assert cfg.inference_batch_size == 64

    cfg2 = _cfg(extra=['--dp_devices', '4'])
    assert cfg2.train_batch_size == 128
    assert cfg2.inference_batch_size == 256


def test_derived_fields_prop():
    '''strides: audio timespan 0.96 s, video 64/25 = 2.56 s
    (reference: config_constructor.py:56-67).'''
    cfg = _cfg('train_prop')
    assert cfg.strides['audio'] == 0.96
    assert cfg.strides['video'] == 64 / 25
    assert cfg.pad_feats_up_to == {'audio': 800, 'video': 300}
    assert cfg.kernel_sizes['audio'][0] == 5


def test_config_json_roundtrip(tmp_path):
    cfg = _cfg('train_prop', extra=['--dont_log'])
    path = str(tmp_path / 'cfg.json')
    cfg.save_json(path)
    cfg2 = Config.load_json(path)
    assert cfg2.strides == {'audio': 0.96, 'video': 2.56}
    assert cfg2.modality == cfg.modality
    assert cfg2.to_dict().keys() == cfg.to_dict().keys()


def test_unimodal_config_skips_other_modality():
    cfg = _cfg(extra=['--modality', 'audio'])
    assert hasattr(cfg, 'd_ff_audio') and not hasattr(cfg, 'd_ff_video')


def test_exper_name_pins_checkpoint_dir():
    '''--exper_name makes log/checkpoint paths deterministic so a
    relaunched run can find its rolling last_* checkpoint and resume.'''
    from bmt_tpu.config import Config, build_parser
    argv = ['--procedure', 'train_cap', '--exper_name', 'myrun']
    cfg = Config(build_parser().parse_args(argv))
    assert cfg.model_checkpoint_path.endswith('myrun')
    assert cfg.log_path.endswith('myrun')
    # two processes, same name -> same dirs (unlike the timestamp default)
    cfg2 = Config(build_parser().parse_args(argv))
    assert cfg2.model_checkpoint_path == cfg.model_checkpoint_path
