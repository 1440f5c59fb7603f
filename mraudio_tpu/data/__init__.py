from mraudio_tpu.data.annotations import chunk_annotations, load_annotations, save_jsonl
from mraudio_tpu.data.dataset import MRDataset, Batch
from mraudio_tpu.data.sampling import sample_frame_indices

__all__ = [
    "load_annotations",
    "save_jsonl",
    "chunk_annotations",
    "sample_frame_indices",
    "MRDataset",
    "Batch",
]
