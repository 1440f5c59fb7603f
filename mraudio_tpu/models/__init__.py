from mraudio_tpu.models.eva_vit import EvaViT
from mraudio_tpu.models.beats import BeatsEncoder
from mraudio_tpu.models.qformer import QFormer
from mraudio_tpu.models.llama import LlamaModel

__all__ = ["EvaViT", "BeatsEncoder", "QFormer", "LlamaModel"]
