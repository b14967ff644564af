'''Bandwidth accounting for any jitted step: where do the bytes go?

On a memory-bound program (the BMT train step's DEVICE time sits at the
HBM roofline — docs/DESIGN.md §6b), "the profile" is not a FLOP table
but a byte table: which buffers materialize, how large, and which
source line produced them. (Caveat: the census RANKS buffers reliably;
its absolute total overcounts fused reuse ~2×, so pair it with
`examples/device_time_trace.py` for true device cost.) This example compiles the flagship captioning train
forward/backward and prints the optimized-HLO buffer census
(``bmt_tpu.utils.profiling.hlo_traffic_census``) — the tool that found
dropout's unfused uint32 bit tensors (the round-5 u16-mask optimization)
and proved the attention softmax residuals are already well handled.

Usage: python examples/traffic_census.py [--B 32] [--grad]
(CPU works for the census — buffer sizes are backend-independent; layout
copies differ per backend, so run on TPU for the numbers that match the
DESIGN tables.)
'''
import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(1, os.path.join(os.path.dirname(__file__), '..'))

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.models.captioning import bimodal_transformer_forward
from bmt_tpu.ops.masks import make_masks
from bmt_tpu.train.losses import label_smoothing_kl_logits
from bmt_tpu.train.steps import cast_tree
from bmt_tpu.utils.profiling import hlo_traffic_census


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--B', type=int, default=32)
    ap.add_argument('--Sa', type=int, default=256)
    ap.add_argument('--Sv', type=int, default=96)
    ap.add_argument('--Sc', type=int, default=22)
    ap.add_argument('--voc', type=int, default=10172)
    ap.add_argument('--grad', action='store_true',
                    help='census the forward+backward instead of forward')
    ap.add_argument('--top', type=int, default=12)
    args = ap.parse_args(argv)

    bf16 = jnp.bfloat16
    dims = CapModelDims(voc_size=args.voc)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    captions = np.full((args.B, args.Sc), 1, np.int32)
    captions[:, 0] = 2
    captions[:, 1:-2] = rng.integers(4, args.voc,
                                     size=(args.B, args.Sc - 3))
    captions[:, -2] = 3
    batch = {
        'src': {
            'rgb': jnp.asarray(rng.normal(size=(args.B, args.Sv, 1024)),
                               jnp.float32),
            'flow': jnp.asarray(rng.normal(size=(args.B, args.Sv, 1024)),
                                jnp.float32),
            'audio': jnp.asarray(rng.normal(size=(args.B, args.Sa, 128)),
                                 jnp.float32),
        },
        'caption': jnp.asarray(captions),
    }
    key = jax.random.key(0, impl='rbg')

    def loss_fn(p):
        cap = batch['caption']
        cap_x, cap_y = cap[:, :-1], cap[:, 1:]
        src = jax.tree.map(lambda x: x.astype(bf16), batch['src'])
        masks = make_masks(batch['src'], cap_x, dims.modality, 1)
        logits = bimodal_transformer_forward(
            cast_tree(p, bf16), dims, src, cap_x, masks, rng=key,
            deterministic=False, return_logits=True)
        kl = label_smoothing_kl_logits(logits, cap_y, 0.7, 1)
        return kl / jnp.maximum(jnp.sum(cap_y != 1), 1)

    fn = (jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)[1])
          if args.grad else jax.jit(loss_fn))
    print(f'compiling {"fwd+bwd" if args.grad else "fwd"} '
          f'(B={args.B})...', file=sys.stderr)
    census = hlo_traffic_census(fn.lower(params).compile(), top=args.top)

    print(f'total materialized output bytes: '
          f'{census["total_bytes"] / 1e6:.0f} MB')
    print('-- by op kind:')
    for op, b in list(census['by_op'].items())[:10]:
        print(f'   {op:24s} {b / 1e6:9.1f} MB')
    print('-- by source line:')
    for src, b in list(census['by_source'].items())[:12]:
        print(f'   {src:44s} {b / 1e6:9.1f} MB')
    print('-- largest single buffers:')
    for b, op, src, name in census['top']:
        print(f'   {b / 1e6:8.1f} MB  {op:16s} {src:36s} {name[:44]}')


if __name__ == '__main__':
    main()
