from bmt_tpu.decode.greedy import (greedy_decode_bimodal,
                                   greedy_decode_uncached,
                                   make_bimodal_greedy_fn,
                                   make_unimodal_greedy_fn)
from bmt_tpu.decode.beam import (beam_search_bimodal, beam_search_unimodal,
                                 make_bimodal_beam_fn)
from bmt_tpu.decode.sample import (filter_logits, make_bimodal_sample_fn,
                                   sample_decode_bimodal,
                                   sample_decode_unimodal)
