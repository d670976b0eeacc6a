from .batch import Batch
from .collate import collate_batch, pick_bucket
from .datasets import (
    SyntheticSpeechDataset,
    load_librispeech_dir,
    load_training_datasets,
)

__all__ = [
    "Batch",
    "collate_batch",
    "pick_bucket",
    "SyntheticSpeechDataset",
    "load_librispeech_dir",
    "load_training_datasets",
]
