from bmt_tpu.ops.masks import subsequent_mask, pad_mask, mask, make_masks
from bmt_tpu.ops.attention import multi_head_attention, init_mha
from bmt_tpu.ops.layers import (
    layer_norm, init_layer_norm,
    linear, init_linear,
    feed_forward, init_ffn,
    residual, bridge, init_bridge,
    positional_encoding_table, positional_encode,
    vocabulary_embed, init_vocab_embedder,
    feature_embed, init_feature_embedder,
)
from bmt_tpu.ops.quant import (qlinear, quantize_linear_int8,
                               quantize_tree_int8, count_quantized)
