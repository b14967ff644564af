from bmt_tpu.utils.proposal_utils import (tiou_vectorized, calculate_f1,
                                          calc_anchors_using_kmeans,
                                          select_topk_predictions,
                                          get_corner_coords, trim_proposals,
                                          remove_very_short_segments,
                                          non_max_suppression,
                                          postprocess_preds, AnetPredictions)
from bmt_tpu.utils.misc import (average_metrics_in_two_dicts, timer, md5sum,
                                make_metafile, HiddenPrints)
