from egovlp_tpu.metrics.retrieval import t2v_metrics, v2t_metrics
from egovlp_tpu.metrics.egomcq import egomcq_accuracy_metrics
from egovlp_tpu.metrics.ndcg import (
    calculate_DCG,
    calculate_IDCG,
    calculate_k_counts,
    calculate_nDCG,
)
from egovlp_tpu.metrics.map import calculate_mAP
from egovlp_tpu.metrics.charades import charades_map, charades_metrics
from egovlp_tpu.metrics.oscc_pnr import oscc_metrics, pnr_metrics
from egovlp_tpu.metrics.mir import mir_metrics

METRIC_REGISTRY = {
    "t2v_metrics": t2v_metrics,
    "v2t_metrics": v2t_metrics,
    "egomcq_accuracy_metrics": egomcq_accuracy_metrics,
    "charades_metrics": charades_metrics,
    "oscc_metrics": oscc_metrics,
    "pnr_metrics": pnr_metrics,
    "mir_metrics": mir_metrics,
}
