from bmt_tpu.data.tokenizer import tokenize_en
from bmt_tpu.data.vocab import Vocab, build_vocab_from_meta, load_glove
from bmt_tpu.data.features import (crop_a_segment, pad_segment,
                                   fill_missing_features,
                                   load_features_from_npy)
