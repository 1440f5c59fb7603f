"""Golden parity for `text/prompts.py` against the reference imported
in-process: the live two-line query prompt (`utils/mr_dataset.py:95-99`)
and the five timestamp-format experiment helpers
(`utils/utils.py:462-603`).
"""

import pytest
import torch

from mraudio_tpu.text.prompts import (
    MODALITY_CUES,
    build_query_prompt,
    format_timestamp_prompt,
)


def test_live_prompt_matches_reference_construction():
    """Byte-identical to the reference's live prompt (the elaborate
    few-shot prompt above it is dead code — overwritten at
    `utils/mr_dataset.py:95-99`)."""
    query = "a person waves at the camera"
    query_prompt = "Query: " + query + "\n"
    task_prompt = (
        "Given the video and the query, find the relevant windows."
        "\nRelevant windows: "
    )
    assert build_query_prompt(query) == query_prompt + task_prompt


def test_modality_cues_match_reference():
    """Cue strings of `models/xinstructblip.py:206-209`."""
    assert MODALITY_CUES == {"video": " video: ", "audio": " audio: "}


TIMESTAMPS = [0.0, 3.7, 12.49, 12.51, 60.0, 149.3]
DURATION = 150.7
ANNOYING = {12: 11, 150: 149}


@pytest.fixture()
def ref_utils(reference):
    return reference.utils


def _ref_batch():
    # float64 so .item() round-trips the exact Python values our
    # formatter receives (float32 tensors would shift 150.7 to
    # 150.6999969..., a test artifact, not a parity question)
    return (
        [torch.tensor(TIMESTAMPS, dtype=torch.float64)],
        [torch.tensor(DURATION, dtype=torch.float64)],
    )


def test_seconds_integers_matches_reference(ref_utils):
    t, d = _ref_batch()
    ref_ts, ref_dur, ref_prompts = ref_utils.get_timestamps_as_seconds_integers(
        t, d, annoying_numbers_replacement_dict=ANNOYING
    )
    ts, dur, prompt = format_timestamp_prompt(
        TIMESTAMPS, DURATION, "seconds_integers",
        annoying_numbers_replacement=ANNOYING,
    )
    assert prompt == ref_prompts[0]
    assert ts == [float(x) for x in ref_ts[0].tolist()]
    assert dur == float(ref_dur[0])


def test_relative_integers_matches_reference(ref_utils):
    t, d = _ref_batch()
    ref_ts, ref_dur, ref_prompts = ref_utils.get_timestamps_as_relative_integers(
        t, d
    )
    ts, dur, prompt = format_timestamp_prompt(
        TIMESTAMPS, DURATION, "relative_integers"
    )
    assert prompt == ref_prompts[0]
    assert ts == [float(x) for x in ref_ts[0].tolist()]
    assert dur == float(ref_dur[0].item())


def test_seconds_floats_matches_reference(ref_utils):
    t, d = _ref_batch()
    ref_ts, ref_dur, ref_prompts = ref_utils.get_timestamps_as_seconds_floats(
        t, d
    )
    ts, dur, prompt = format_timestamp_prompt(
        TIMESTAMPS, DURATION, "seconds_floats"
    )
    assert prompt == ref_prompts[0]
    # the reference re-tensorizes the rounded values at default float32
    # (`torch.tensor([round(...)])`, utils/utils.py:555) — its storage
    # artifact, not a formatting difference; the prompt already matched
    assert ts == pytest.approx(ref_ts[0].tolist(), abs=1e-4)
    assert dur == float(ref_dur[0].item())


def test_relative_floats_prompt_matches_reference(ref_utils):
    """Prompt strings match; the reference's returned timestamp list has
    len(t)+1 entries (it appends round(duration) WITHOUT dropping a
    slot, `utils/utils.py:580-585`), which cannot feed a fixed
    n_frms-slot interleave — we keep len(t) by replacing the final slot
    (docstring, `text/prompts.py`)."""
    t, d = _ref_batch()
    ref_ts, _, ref_prompts = ref_utils.get_timestamps_as_relative_floats(t, d)
    ts, _, prompt = format_timestamp_prompt(
        TIMESTAMPS, DURATION, "relative_floats"
    )
    assert prompt == ref_prompts[0]
    assert len(ref_ts[0]) == len(TIMESTAMPS) + 1  # the reference quirk
    assert len(ts) == len(TIMESTAMPS)
    assert ts[:-1] == pytest.approx(ref_ts[0].tolist()[: len(TIMESTAMPS) - 1])
    assert ts[-1] == float(round(DURATION))


def test_framenumbers_reference_path_is_broken(ref_utils):
    """The reference concatenates `">" + d.item()` with a float
    (`utils/utils.py:597`) — a TypeError on any numeric duration; our
    formatter spells the duration with str() instead (fix documented in
    docs/DIVERGENCES.md territory: dead experiment path)."""
    t, d = _ref_batch()
    with pytest.raises(TypeError):
        ref_utils.get_timestamps_as_framenumbers(t, d)
    ts, dur, prompt = format_timestamp_prompt(
        TIMESTAMPS, DURATION, "framenumbers"
    )
    assert prompt == ">".join(str(i) for i in range(len(TIMESTAMPS))) + ">" + str(DURATION)
    assert ts == [float(i) for i in range(len(TIMESTAMPS))]


def test_fewshot_prompt_surface():
    """prompt_style="fewshot": the reference's dead experimental surface
    (utils/mr_dataset.py:57-93) re-provided as an opt-in — tagged
    query/duration, worked relative-window examples, format rules."""
    from mraudio_tpu.text.prompts import (
        FEWSHOT_EXAMPLES,
        build_fewshot_prompt,
        build_prompt,
        build_query_prompt,
    )

    p = build_fewshot_prompt("a dog barks twice", 120.0)
    assert "<Query> a dog barks twice </Query>" in p
    assert "<Duration> 120 </Duration>" in p
    assert "<Example>" in p and "<Format>" in p
    for q, d, w in FEWSHOT_EXAMPLES:
        assert q in p and w in p
    assert p.endswith("relevant_windows: ")

    assert build_prompt("live", "q", 10) == build_query_prompt("q")
    assert build_prompt("", "q", 10) == build_query_prompt("q")
    assert build_prompt("fewshot", "q", 10) == build_fewshot_prompt("q", 10)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        build_prompt("nope", "q", 10)


def test_dataset_prompt_style_knob():
    from mraudio_tpu.config import tiny_data_config
    from mraudio_tpu.data.dataset import MRDataset

    ann = [{"vid": "v0", "qid": 0, "query": "x happens", "duration": 60,
            "relevant_windows": [[1, 2]]}]
    ds = MRDataset(tiny_data_config(n_frms=4).replace(prompt_style="fewshot"),
                   annotations=ann)
    s = ds.get(0)
    assert "<Query> x happens </Query>" in s.text_input
