"""Parity tests for span-string repair/parsing vs. the reference oracle."""

import numpy as np
import pytest

from mraudio_tpu.text import (
    convert_percentages_to_second,
    convert_to_absolute_time,
    moment_str_to_list,
    post_process,
    post_process_tal,
    tal_str_to_list,
)

POST_PROCESS_CASES = [
    "[[0, 1], [4, 7]]",
    "[[0, 1] [4, 7]]",
    "[[0 1], [4 7]]",
    "[[0,, 1], [4, 7]],",
    "[[1, 0]]",
    "[[12, 35]]</s> extra",
    "[[5, 3], [9, 2]]",
    "garbage",
    "[[-1, -1]]",
    "[]",
    "[[0.5, 1.2]]",
    "[[0, 1],\n[4, 7]]",
    "[[10 2]]",
    "[[003, 001]]",
    "[[1, 2], [3, 4], [5, 6]]",
    "[[1, 2],, [3, 4]]",
    "[[1,2]]",
    "  [[1, 2]]",
    "[[1, 2]]  ",
    "[[150, 150]]",
    "[[0, 150]] some trailing text",
    "relevant windows: [[0, 10]]",
    "[[]]",
    "[[1]]",
    "[[1, 2, 3]]",
]

MOMENT_STR_CASES = [
    "[[0, 1], [4, 7]]",
    "[[-1, -1]]",
    "not a list",
    "[[1, 2, 3]]",
    "[[1]]",
    "[[0.5, 1.0]]",
    "[1, [2, 3]]",
    "[[1, 2], 7]",
    "[['a', 'b']]",
    "[[1, 2], [3]]",
    "[()]",
    "[[1, 2], [4, 7], [9, 12]]",
    "5",
    "[[2147483647, 2147483648]]",
]


@pytest.mark.parametrize("case", POST_PROCESS_CASES)
def test_post_process_matches_reference(reference, case):
    assert post_process(case) == reference.utils.post_process(case)


@pytest.mark.parametrize("case", MOMENT_STR_CASES)
def test_moment_str_to_list_matches_reference(reference, case):
    assert moment_str_to_list(case) == reference.utils.moment_str_to_list(case)


@pytest.mark.parametrize("case", POST_PROCESS_CASES)
def test_roundtrip_matches_reference(reference, case):
    """The live eval path is moment_str_to_list(post_process(raw))."""
    ours = moment_str_to_list(post_process(case))
    theirs = reference.utils.moment_str_to_list(reference.utils.post_process(case))
    assert ours == theirs


TAL_CASES = [
    '[[0, 1, "run"], [4, 7, "jump"]]',
    '[[1, 0, "run"]]',
    '[[0 1, "walk"]]',
    '[[0, 1 "walk"]]',
    "[[0 1 walk]]",
    "junk",
    '[[0, 1, "a"],]',
    '[[1, 2, 3, "x"]]',
    "[[-1, -1, -1]]",
]


@pytest.mark.parametrize("case", TAL_CASES)
def test_post_process_tal_matches_reference(reference, case):
    assert post_process_tal(case) == reference.utils.post_process_TAL(case)


@pytest.mark.parametrize(
    "case",
    [
        '[[0, 1, "run"], [4, 7, "jump"]]',
        "[[-1, -1, -1]]",
        "junk",
        '[[1, 2, "a", "b"]]',
        "[[1, 2]]",
    ],
)
def test_tal_str_to_list_matches_reference(reference, case):
    assert tal_str_to_list(case) == reference.utils.tal_str_to_list(case)


@pytest.mark.parametrize(
    "case,duration",
    [
        ("[[0.1, 0.5]]", 150),
        ("[[0.5, 0.2], [0.7, 0.9]]", 60),
        ("nonsense", 100),
        ("[[10, 20]]", 150),
    ],
)
def test_convert_percentages_matches_reference(reference, case, duration):
    assert convert_percentages_to_second(case, duration) == (
        reference.utils.convert_percentages_to_second(case, duration)
    )


@pytest.mark.parametrize("fmt", ["relative_integers", "relative_floats"])
def test_convert_to_absolute_time_matches_reference(reference, fmt):
    preds = ["[[10, 50]]", "[[-1, -1]]", "[[25, 75], [80, 90]]"]
    durations = [150.0, 60.0, 120.0]
    assert convert_to_absolute_time(preds, durations, fmt) == (
        reference.utils.convert_to_absolute_time(preds, durations, fmt)
    )


def test_post_process_fuzz_matches_reference(reference, rng):
    """Randomised near-miss strings: mutate valid window strings with the
    error classes the repair targets (dropped commas, doubled commas,
    swapped order, trailing text)."""
    for _ in range(200):
        n_windows = rng.integers(1, 4)
        windows = []
        for _ in range(n_windows):
            a, b = sorted(rng.integers(0, 151, size=2).tolist())
            sep = rng.choice([", ", " ", ",, ", ","])
            windows.append(f"[{a}{sep}{b}]")
        joiner = rng.choice([", ", " ", ","])
        s = "[" + joiner.join(windows) + "]"
        if rng.random() < 0.3:
            s += "</s>" + "tail"
        if rng.random() < 0.2:
            s = s.replace("[", "", 1)
        ours = moment_str_to_list(post_process(s))
        theirs = reference.utils.moment_str_to_list(reference.utils.post_process(s))
        assert ours == theirs, f"mismatch for {s!r}"
