from mraudio_tpu.infer.generate import greedy_generate

__all__ = ["greedy_generate"]
