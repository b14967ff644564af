'''Full-scale end-to-end training demo on synthetic learnable data.

Generates an ActivityNet-shaped dataset where captions are a deterministic
function of a class signature injected into the features (so there is real
signal to learn), then runs the unmodified ``train_cap`` driver with the
full 51 M-parameter architecture. Validation METEOR/BLEU must climb — an
at-scale exercise of the entire pipeline (native IO, bucketing, dp mesh,
KV-cached 1-by-1 validation, scoring, checkpointing) on real hardware.

Usage:  python examples/synthetic_e2e.py [--videos 256] [--epochs 3]
'''
import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(1, os.path.join(os.path.dirname(__file__), '..'))

TEMPLATES = [
    'a man runs across the field',
    'a woman plays the guitar on stage',
    'a dog jumps over the fence',
    'two people dance in the kitchen',
    'a child draws with colored pencils',
    'an athlete lifts heavy weights',
    'a chef slices vegetables quickly',
    'a group sings around the campfire',
    'a cyclist rides down the mountain',
    'a cat sleeps on the warm windowsill',
    'a painter covers the wall with rollers',
    'a swimmer dives into the cold pool',
    'a barista pours milk into the cup',
    'a gardener waters the young plants',
    'a violinist performs a slow melody',
    'a skater glides along the river path',
]


def make_dataset(root: str, n_videos: int, d_vid=1024, d_aud=128, seed=0):
    rng = np.random.default_rng(seed)
    vdir = os.path.join(root, 'video_npy')
    adir = os.path.join(root, 'audio_npy')
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(adir, exist_ok=True)

    K = len(TEMPLATES)
    sig_v = rng.normal(size=(K, d_vid)).astype(np.float32) * 2.0
    sig_a = rng.normal(size=(K, d_aud)).astype(np.float32) * 2.0

    rows = {'train': [], 'val_1': [], 'val_2': []}
    jd = {p: {} for p in rows}
    idx = {p: 0 for p in rows}

    for v in range(n_videos):
        vid = f'v_syn{v:05d}'
        Sv = int(rng.integers(18, 40))
        Sa = int(rng.integers(24, 56))
        duration = float(Sv) * 2.56
        rgb = rng.normal(size=(Sv, d_vid)).astype(np.float32)
        flow = rng.normal(size=(Sv, d_vid)).astype(np.float32)
        aud = rng.normal(size=(Sa, d_aud)).astype(np.float32)

        phase = ('train' if v % 8 < 6 else ('val_1' if v % 8 == 6 else 'val_2'))
        sents, ts = [], []
        for e in range(2):
            start = duration * (0.05 + 0.5 * e)
            end = start + duration * 0.4
            cls = int(rng.integers(0, K))
            # inject the class signature into the segment's features
            s_v, e_v = int(Sv * start / duration), int(Sv * end / duration)
            s_a, e_a = int(Sa * start / duration), int(Sa * end / duration)
            rgb[s_v:e_v] += sig_v[cls]
            aud[s_a:e_a] += sig_a[cls]
            cap = TEMPLATES[cls]
            rows[phase].append((vid, cap, round(start, 2), round(end, 2),
                                round(duration, 2), phase, idx[phase]))
            idx[phase] += 1
            sents.append(cap)
            ts.append([round(start, 2), round(end, 2)])
        jd[phase][vid] = {'duration': round(duration, 2),
                          'sentences': sents, 'timestamps': ts}

        np.save(os.path.join(vdir, f'{vid}_rgb.npy'), rgb)
        np.save(os.path.join(vdir, f'{vid}_flow.npy'), flow)
        np.save(os.path.join(adir, f'{vid}.npy'), aud)

    for phase, rs in rows.items():
        with open(os.path.join(root, f'{phase}.csv'), 'w') as f:
            f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
            for r in rs:
                f.write('\t'.join(map(str, r)) + '\n')
    for phase, d in jd.items():
        with open(os.path.join(root, f'{phase}.json'), 'w') as f:
            json.dump(d, f)
        with open(os.path.join(root, f'{phase}_no_missings.json'), 'w') as f:
            json.dump(d, f)
    with open(os.path.join(root, 'available_mp4.txt'), 'w') as f:
        f.write(''.join(f'v_syn{v:05d}.mp4\n' for v in range(n_videos)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--videos', type=int, default=256)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--B', type=int, default=32)
    ap.add_argument('--root', type=str, default=None)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--stage', choices=['cap', 'prop'], default='cap')
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix='bmt_synth_')
    print(f'dataset root: {root}')
    rows = make_dataset(root, args.videos)
    print({k: len(v) for k, v in rows.items()})

    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.train.cap_trainer import train_cap
    from bmt_tpu.train.prop_trainer import train_prop

    procedure = 'train_cap' if args.stage == 'cap' else 'train_prop'
    argv = [
        '--procedure', procedure,
        '--train_meta_path', os.path.join(root, 'train.csv'),
        '--val_1_meta_path', os.path.join(root, 'val_1.csv'),
        '--val_2_meta_path', os.path.join(root, 'val_2.csv'),
        '--video_features_path', os.path.join(root, 'video_npy'),
        '--audio_features_path', os.path.join(root, 'audio_npy'),
        '--train_json_path', os.path.join(root, 'train.json'),
        '--reference_paths', os.path.join(root, 'val_1_no_missings.json'),
        os.path.join(root, 'val_2_no_missings.json'),
        '--avail_mp4_path', os.path.join(root, 'available_mp4.txt'),
        '--B', str(args.B), '--epoch_num', str(args.epochs),
        '--one_by_one_starts_at', '0', '--lr', str(args.lr),
        '--smoothing', '0.3',
        '--log_dir', os.path.join(root, 'log'),
    ]
    if args.stage == 'prop':
        # synthetic videos are short; remat covers the padded 800/300 path
        argv += ['--remat']
    cfg = Config(build_parser().parse_args(argv))
    if args.stage == 'cap':
        best = train_cap(cfg)
        print(f'FINAL best avg METEOR: {best:.4f}')
    else:
        import os as _os
        _os.chdir(root)  # ./tmp caches
        best = train_prop(cfg)
        print(f'FINAL best avg F1: {best:.4f}')
    return best


if __name__ == '__main__':
    main()
