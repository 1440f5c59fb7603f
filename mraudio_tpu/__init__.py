"""mraudio_tpu — a TPU-native audio-visual moment-retrieval framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
mrAudio research stack (reference: globc/mrAudio): given a video, its
audio track, and a natural-language query, predict the relevant time
windows ``[[t_start, t_end], ...]`` via an LLM that decodes the window
as text.

Layers (bottom → top), mirroring the reference layer map but with a
TPU-first design:

- ``mraudio_tpu.ops``       — Pallas/XLA kernels (mel fbank, attention, quant)
- ``mraudio_tpu.models``    — EVA-ViT / BEATs / Q-Former / Llama and the
                              X-InstructBLIP + VideoLLaMA assemblies
- ``mraudio_tpu.data``      — annotation loading, frame sampling, static-shape
                              batching, native video/audio decode bindings
- ``mraudio_tpu.parallel``  — device mesh + sharding rules (dp/tp axes)
- ``mraudio_tpu.train``     — jitted train step, optax schedules, orbax ckpt
- ``mraudio_tpu.infer``     — batched KV-cache generation + eval drivers
- ``mraudio_tpu.eval``      — moment-retrieval metrics (exact parity with the
                              reference ``eval/mr_eval.py``)
- ``mraudio_tpu.text``      — span parsing / prompt formatting utilities
"""

__version__ = "0.1.0"
