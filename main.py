'''CLI entry point, signature-compatible with the reference
(reference: main.py:20-184):

    python main.py --procedure {train_cap,train_prop,evaluate} [flags]

plus TPU-specific knobs (--dp_devices, --compute_dtype, --attention_impl,
--glove_path). See bmt_tpu/config.py for the full flag surface.
'''
from pprint import pprint

from bmt_tpu.config import Config, build_parser


def main(cfg: Config):
    if cfg.procedure == 'train_cap':
        from bmt_tpu.train.cap_trainer import train_cap
        train_cap(cfg)
    elif cfg.procedure == 'train_prop':
        from bmt_tpu.train.prop_trainer import train_prop
        train_prop(cfg)
    elif cfg.procedure == 'evaluate':
        from bmt_tpu.scripts.eval_on_learned_props import eval_on_learned_props
        eval_on_learned_props(cfg)
    else:
        raise NotImplementedError(cfg.procedure)


if __name__ == '__main__':
    parser = build_parser()
    args = parser.parse_args()
    pprint(vars(args))
    cfg = Config(args)
    if args.debug:
        # reference quirk (main.py:178-182): --debug is a hook for ad-hoc
        # experiments with a fully-built Config and runs NO procedure. Say
        # so instead of exiting 0 silently.
        print('--debug: config built, no procedure run '
              '(reference main.py:178-182 semantics)')
    else:
        main(cfg)
