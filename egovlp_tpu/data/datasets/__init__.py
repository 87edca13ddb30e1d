"""Dataset registry.

Names match the reference loader factory
(/root/reference/data_loader/data_loader.py:16-68) so configs translate
one-to-one.
"""

from egovlp_tpu.data.datasets.base import DatasetConfig, TextVideoDataset
from egovlp_tpu.data.datasets.egoclip import EgoClipDataset, EgoMCQDataset
from egovlp_tpu.data.datasets.epic import EpicMIRDataset
from egovlp_tpu.data.datasets.charades import CharadesEgoDataset
from egovlp_tpu.data.datasets.oscc_pnr import Ego4DOSCCDataset, Ego4DPNRDataset
from egovlp_tpu.data.datasets.nlq_mq import Ego4DMQDataset, Ego4DNLQDataset
from egovlp_tpu.data.datasets.webvid import WebVidDataset
from egovlp_tpu.data.datasets.cc3m import ConceptualCaptionsDataset


def dataset_factory(name: str):
    registry = {
        "EgoClip": EgoClipDataset,
        "EgoClip_EgoMCQ": _egoclip_dispatch,
        "EgoMCQ": EgoMCQDataset,
        "MultiInstanceRetrieval": EpicMIRDataset,
        "EpicKitchens_MIR": EpicMIRDataset,
        "CharadesEgo": CharadesEgoDataset,
        "Ego4D_OSCC": Ego4DOSCCDataset,
        "Ego4D_PNR": Ego4DPNRDataset,
        "Ego4D_NLQ": Ego4DNLQDataset,
        "Ego4D_MQ": Ego4DMQDataset,
        "WebVid": WebVidDataset,
        "ConceptualCaptions3M": ConceptualCaptionsDataset,
    }
    if name not in registry:
        raise NotImplementedError(f"unknown dataset {name!r}")
    return registry[name]


def _egoclip_dispatch(cfg: DatasetConfig):
    """The reference's EgoClip_EgoMCQ switches on split (train -> EgoClip
    csv, val/test -> EgoMCQ json)."""
    cls = EgoClipDataset if cfg.split == "train" else EgoMCQDataset
    return cls(cfg)
