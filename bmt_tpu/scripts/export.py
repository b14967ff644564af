'''Checkpoint export CLI: native checkpoint → reference-format ``.pt``
(or an adapter-merged native ``params.npz``).

    # captioner -> best_cap_model.pt the ORIGINAL torch repo can load
    python -m bmt_tpu.scripts.export --checkpoint <native ckpt dir> \
        --out best_cap_model.pt

    # proposal generator -> best_prop_model.pt (reference save_model
    # layout incl. the top-level anchors dict)
    python -m bmt_tpu.scripts.export --checkpoint <dir> --model prop \
        --out best_prop_model.pt

    # LoRA finetune -> plain merged native params (deployment weights)
    python -m bmt_tpu.scripts.export --checkpoint <dir> --out merged.npz

LoRA adapters are always folded into the base weights on export — the
reference model has no adapter slots, and a merged tree IS the finetune's
effective model (ops/lora.py). The ``.pt`` writers are the validated ones
from bmt_tpu.train.checkpoint (tested against real-torch strict loads in
tests/test_torch_export.py / test_torch_prop_export.py). Reference
analog: none — the reference can only SAVE from its own training loop
(captioning_epoch_loops.py:68-88).
'''
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--checkpoint', required=True,
                   help='native checkpoint DIR (npz or orbax) holding '
                        'best_{cap,prop}_model.*')
    p.add_argument('--model', default='cap', choices=['cap', 'prop'])
    p.add_argument('--out', required=True,
                   help='output path: *.pt -> reference torch format; '
                        '*.npz -> merged native params')
    p.add_argument('--allow_vocab_drift', action='store_true')
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)
    from bmt_tpu.train.checkpoint import (load_cap_checkpoint,
                                          load_prop_checkpoint,
                                          read_checkpoint_meta,
                                          save_pytree_npz,
                                          save_torch_checkpoint,
                                          save_torch_prop_checkpoint)

    if args.model == 'cap':
        cfg, _, params, _ = load_cap_checkpoint(
            args.checkpoint, allow_vocab_drift=args.allow_vocab_drift)
        meta = read_checkpoint_meta(args.checkpoint, 'best_cap_model')
        save_pt = save_torch_checkpoint
    else:
        cfg, _, params = load_prop_checkpoint(args.checkpoint)
        meta = read_checkpoint_meta(args.checkpoint, 'best_prop_model')
        save_pt = save_torch_prop_checkpoint

    if args.out.endswith('.pt'):
        save_pt(args.out, params, meta)
    else:
        from bmt_tpu.ops.lora import count_lora, merge_lora
        if count_lora(params)[0]:
            params = merge_lora(params)
        save_pytree_npz(args.out, params)
    print(f'exported {args.model} checkpoint -> {args.out}')
    return args.out


if __name__ == '__main__':
    main()
