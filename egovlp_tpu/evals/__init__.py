from egovlp_tpu.evals.egomcq import evaluate_egomcq
from egovlp_tpu.evals.epic_mir import dual_softmax, evaluate_epic_mir
from egovlp_tpu.evals.charades import evaluate_charades, load_charades_classes
from egovlp_tpu.evals.oscc_pnr import evaluate_oscc, evaluate_pnr
from egovlp_tpu.evals.features import extract_text_features, extract_video_features
