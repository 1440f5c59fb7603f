"""Prompt construction for moment retrieval.

The live prompt of the reference is the short two-line query+task string
(``utils/mr_dataset.py:95-99``); the elaborate few-shot prompt built just
above it (``:57-93``) is dead code and intentionally not reproduced.

Timestamp prompt formats mirror the five experiment variants of
``utils/utils.py:462-603`` but operate on plain Python floats instead of
torch tensors (timestamps are host-side metadata here; the device only
ever sees their token embeddings).
"""

from __future__ import annotations

from typing import Mapping, Sequence

TASK_PROMPT = (
    "Given the video and the query, find the relevant windows.\nRelevant windows: "
)

# Cue strings announcing each modality segment in the interleaved LLM input
# (reference ``models/xinstructblip.py:206-209``).
MODALITY_CUES = {
    "video": " video: ",
    "audio": " audio: ",
}

TIME_FORMATS = (
    "seconds_integers",
    "relative_integers",
    "seconds_floats",
    "relative_floats",
    "framenumbers",
)


def build_query_prompt(query: str) -> str:
    """The live eval/train prompt: ``Query: <q>\\n<task>`` (reference
    ``utils/mr_dataset.py:97-99``)."""
    return "Query: " + query + "\n" + TASK_PROMPT


def _sub_annoying(value: int, replacements: Mapping[int, int] | None) -> int:
    if replacements and value in replacements:
        return replacements[value]
    return value


def format_timestamp_prompt(
    timestamps: Sequence[float],
    duration: float,
    time_format: str = "seconds_integers",
    annoying_numbers_replacement: Mapping[int, int] | None = None,
) -> tuple[list[float], float, str]:
    """Render per-frame timestamps + duration into the ``>``-joined video
    prompt string of the reference's timestamp-format experiments.

    Returns ``(timestamps, duration, video_prompt)`` for a single sample;
    shapes follow ``utils/utils.py:462-603`` per format:

    - ``seconds_integers``  (ref ``:462-508``): ints, ``>t0>t1>...>dur``
      with a leading ``>``; "annoying" token-splitting numbers replaced.
    - ``relative_integers`` (ref ``:511-535``): 0-100 ints, ``t0>...>dur``.
    - ``seconds_floats``    (ref ``:538-558``): 2-decimal floats.
    - ``relative_floats``   (ref ``:561-586``): 0-1 floats; the final
      timestamp slot carries the rounded duration.
    - ``framenumbers``      (ref ``:589-603``): 0..n-1 indices.
    """
    if time_format not in TIME_FORMATS:
        raise ValueError(f"unknown time_format {time_format!r}; expected one of {TIME_FORMATS}")

    if time_format == "seconds_integers":
        vals = [_sub_annoying(int(round(t)), annoying_numbers_replacement) for t in timestamps]
        dur = _sub_annoying(int(round(duration)), annoying_numbers_replacement)
        prompt = ">" + ">".join(str(v) for v in vals) + ">" + str(dur)
        return [float(v) for v in vals], float(dur), prompt

    if time_format == "relative_integers":
        vals = [int(round(t / duration, 2) * 100) for t in timestamps]
        prompt = ">".join(str(v) for v in vals) + ">" + str(round(duration))
        return [float(v) for v in vals], float(duration), prompt

    if time_format == "seconds_floats":
        vals = [round(float(t), 2) for t in timestamps]
        prompt = ">".join(str(v) for v in vals) + ">" + str(round(duration))
        return vals, float(duration), prompt

    if time_format == "relative_floats":
        vals = [round(t / duration, 2) for t in timestamps]
        prompt = ">".join(str(v) for v in vals[:-1]) + ">" + str(round(duration))
        return vals[:-1] + [float(round(duration))], float(duration), prompt

    # framenumbers
    vals = list(range(len(timestamps)))
    prompt = ">".join(str(i) for i in vals) + ">" + str(duration)
    return [float(v) for v in vals], float(duration), prompt
