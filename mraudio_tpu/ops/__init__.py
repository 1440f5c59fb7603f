from mraudio_tpu.ops.fbank import kaldi_fbank, beats_frontend
from mraudio_tpu.ops.image import normalize_frames

__all__ = ["kaldi_fbank", "beats_frontend", "normalize_frames"]
