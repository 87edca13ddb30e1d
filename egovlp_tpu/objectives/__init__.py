from egovlp_tpu.objectives.contrastive import egonce, info_nce
from egovlp_tpu.objectives.ranking import adaptive_max_margin, max_margin
from egovlp_tpu.objectives.classification import cross_entropy

LOSS_REGISTRY = {
    # names match the reference config `loss.type` values
    # (/root/reference/configs/*: EgoNCE, NormSoftmaxLoss,
    #  MaxMarginRankingLoss, AdaptiveMaxMarginRankingLoss, CrossEntropy).
    "EgoNCE": egonce,
    "NormSoftmaxLoss": info_nce,
    "MaxMarginRankingLoss": max_margin,
    "AdaptiveMaxMarginRankingLoss": adaptive_max_margin,
    "CrossEntropy": cross_entropy,
}
