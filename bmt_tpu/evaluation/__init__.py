from bmt_tpu.evaluation.metrics import calculate_metrics
from bmt_tpu.evaluation.anet_eval import ANETcaptions
