"""Offline dataset preparation CLI — the reference's notebook
(``data/data_preprocess.ipynb``) as a real command.

Produces canonical JSONL annotations ``{vid, qid, query, duration,
relevant_windows}`` for:

* ``qvh``          — QVHighlights passes through unchanged (notebook cell 5);
* ``charades_sta`` — parse ``id start end##query`` lines with durations
  from the Charades CSV, optional seeded 800-video val split carved from
  train (cells 8, 10-11; ``random.seed(42)``);
* ``tacos``        — window/duration rounding per cell 22;
* ``activitynet``  — captions json → one record per sentence (cell 27).

All converters support the notebook's absolute/relative × int/float
window encodings (``--relative-time``, ``--save-float``).
"""

from __future__ import annotations

import argparse
import csv
import json
import random

from mraudio_tpu.data.annotations import save_jsonl


def _encode_window(start: float, end: float, duration: float,
                   relative_time: bool, save_float: bool):
    if relative_time:
        start, end = start / duration, end / duration
        if save_float:
            window = [round(start, 2), round(end, 2)]
            assert 0 <= window[0] and window[1] <= 1
        else:
            window = [int(round(start, 2) * 100), int(round(end, 2) * 100)]
            assert 0 <= window[0] and window[1] <= 100
        return window, duration
    if save_float:
        return [float(start), float(end)], duration
    return [round(float(start)), round(float(end))], round(float(duration))


def convert_charades_sta(
    txt_path: str,
    csv_path: str,
    video_ids: set | None = None,
    relative_time: bool = False,
    save_float: bool = False,
) -> list[dict]:
    """``id start end##query`` lines + Charades CSV (length col) →
    records.  End times clamp to duration (notebook cell 10)."""
    meta = {}
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            objects = row.get("objects", "") or ""
            meta[row["id"]] = {
                "duration": float(row["length"]),
                "objects": objects.split(";") if objects else [],
            }

    out = []
    with open(txt_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            head, query = line.split("##", 1)
            vid, start, end = head.split(" ")
            if video_ids is not None and vid not in video_ids:
                continue
            duration = meta[vid]["duration"]
            start, end = float(start), min(float(end), duration)
            window, duration_out = _encode_window(
                start, end, duration, relative_time, save_float
            )
            out.append(
                {
                    "vid": vid,
                    "qid": vid,
                    "query": query,
                    "duration": duration_out,
                    "relevant_windows": [window],
                    "objects": meta[vid]["objects"],
                }
            )
    return out


def charades_val_split(txt_path: str, seed: int = 42, n_val: int = 800):
    """Seeded 800-video validation split carved from train
    (notebook cell 8)."""
    ids = []
    seen = set()
    with open(txt_path) as f:
        for line in f:
            if "##" in line:
                vid = line.split("##")[0].split(" ")[0]
                if vid not in seen:
                    seen.add(vid)
                    ids.append(vid)
    random.seed(seed)
    random.shuffle(ids)
    return set(ids[:n_val]), set(ids[n_val:])


def convert_tacos(
    jsonl_path: str, relative_time: bool = False, save_float: bool = False
) -> list[dict]:
    out = []
    with open(jsonl_path) as f:
        for line in f:
            if not line.strip():
                continue
            qa = json.loads(line)
            duration = round(qa["duration"], 2)
            assert len(qa["relevant_windows"]) == 1
            start, end = qa["relevant_windows"][0]
            window, _ = _encode_window(start, end, qa["duration"], relative_time, save_float)
            out.append(
                {
                    "vid": qa["vid"],
                    "qid": "TACoS_" + str(qa["qid"]),
                    "query": qa["query"],
                    "duration": duration,
                    "relevant_windows": [window],
                }
            )
    return out


def convert_activitynet(
    json_path: str, relative_time: bool = False, save_float: bool = False
) -> list[dict]:
    with open(json_path) as f:
        data = json.load(f)
    out = []
    for video_id, sample in data.items():
        duration = sample["duration"]
        for j, (start, end) in enumerate(sample["timestamps"]):
            window, _ = _encode_window(start, end, duration, relative_time, save_float)
            out.append(
                {
                    "vid": video_id,
                    "qid": f"ActivityNet_{video_id}_{j}",
                    "query": sample["sentences"][j],
                    "duration": duration,
                    "relevant_windows": [window],
                }
            )
    return out


# Prompt templates for TAL class queries (notebook cell 32).
TAL_TEMPLATES_VIDEO = [
    "a video of {}.",
    "a video of a person {}.",
    "a video of a person using {}.",
    "a video of a person doing {}.",
    "a video of a person during {}.",
    "a video of a person performing {}.",
    "a video of a person practicing {}.",
    "a example of {}.",
    "a example of a person {}.",
    "a example of a person using {}.",
    "a example of a person doing {}.",
    "a example of a person during {}.",
    "a example of a person performing {}.",
    "a example of a person practicing {}.",
    "a demonstration of {}.",
    "a demonstration of a person {}.",
    "a demonstration of a person using {}.",
    "a demonstration of a person doing {}.",
    "a demonstration of a person during {}.",
    "a demonstration of a person performing {}.",
    "a demonstration of a person practicing {}.",
]


def convert_activitynet_tal(
    json_path: str, relative_time: bool = False, save_float: bool = False
):
    """ActivityNet-TAL: one record per video with ``[start, end, label]``
    triples (notebook cell 33); returns (train, val, test, classes)."""
    with open(json_path) as f:
        data = json.load(f)
    if "database" in data:
        data = data["database"]

    splits = {"training": [], "validation": [], "testing": []}
    classes: list[str] = []
    for video_id, sample in data.items():
        vid = "v_" + video_id
        duration = sample["duration"]
        windows = []
        for ann in sample.get("annotations", []):
            start, end = ann["segment"]
            label = ann["label"]
            if label not in classes:
                classes.append(label)
            window, _ = _encode_window(start, end, duration, relative_time, save_float)
            windows.append(window + [label])
        record = {
            "vid": vid,
            "qid": f"ActivityNet_{vid}_0",
            "query": "",
            "duration": duration,
            "relevant_windows": windows,
        }
        splits.setdefault(sample.get("subset", "testing"), []).append(record)
    return splits["training"], splits["validation"], splits["testing"], classes


def main(argv=None):
    parser = argparse.ArgumentParser(description="annotation preparation")
    sub = parser.add_subparsers(dest="dataset", required=True)

    ch = sub.add_parser("charades_sta")
    ch.add_argument("--train-txt", required=True)
    ch.add_argument("--test-txt", required=True)
    ch.add_argument("--train-csv", required=True)
    ch.add_argument("--test-csv", required=True)
    ch.add_argument("--output-dir", required=True)
    ch.add_argument("--val-split", action="store_true",
                    help="carve the seeded 800-video val split from train")
    ch.add_argument("--relative-time", action="store_true")
    ch.add_argument("--save-float", action="store_true")

    ta = sub.add_parser("tacos")
    ta.add_argument("--input", required=True)
    ta.add_argument("--output", required=True)
    ta.add_argument("--relative-time", action="store_true")
    ta.add_argument("--save-float", action="store_true")

    an = sub.add_parser("activitynet")
    an.add_argument("--input", required=True)
    an.add_argument("--output", required=True)
    an.add_argument("--relative-time", action="store_true")
    an.add_argument("--save-float", action="store_true")

    tr = sub.add_parser("transcode", help="AVI→MP4 + downscale (TACoS prep)")
    tr.add_argument("--input-dir", required=True)
    tr.add_argument("--output-dir", required=True)
    tr.add_argument("--size", type=int, default=224)

    tal = sub.add_parser("activitynet_tal")
    tal.add_argument("--input", required=True)
    tal.add_argument("--output-dir", required=True)
    tal.add_argument("--relative-time", action="store_true")
    tal.add_argument("--save-float", action="store_true")

    args = parser.parse_args(argv)

    if args.dataset == "charades_sta":
        import os

        os.makedirs(args.output_dir, exist_ok=True)
        if args.val_split:
            val_ids, train_ids = charades_val_split(args.train_txt)
        else:
            val_ids, train_ids = None, None
        train = convert_charades_sta(
            args.train_txt, args.train_csv, train_ids,
            args.relative_time, args.save_float,
        )
        save_jsonl(train, os.path.join(args.output_dir, "charades_sta_train.jsonl"))
        if args.val_split:
            val = convert_charades_sta(
                args.train_txt, args.train_csv, val_ids,
                args.relative_time, args.save_float,
            )
            save_jsonl(val, os.path.join(args.output_dir, "charades_sta_val.jsonl"))
        test = convert_charades_sta(
            args.test_txt, args.test_csv, None, args.relative_time, args.save_float
        )
        save_jsonl(test, os.path.join(args.output_dir, "charades_sta_test.jsonl"))
        print(f"wrote {len(train)} train / {len(test)} test records")
    elif args.dataset == "tacos":
        records = convert_tacos(args.input, args.relative_time, args.save_float)
        save_jsonl(records, args.output)
        print(f"wrote {len(records)} records")
    elif args.dataset == "activitynet":
        records = convert_activitynet(args.input, args.relative_time, args.save_float)
        save_jsonl(records, args.output)
        print(f"wrote {len(records)} records")
    elif args.dataset == "transcode":
        import os

        from mraudio_tpu.data import native_bindings as nb

        lib = nb.load()
        os.makedirs(args.output_dir, exist_ok=True)
        count = 0
        for name in sorted(os.listdir(args.input_dir)):
            if not name.lower().endswith((".avi", ".mp4", ".mkv", ".mov")):
                continue
            dst = os.path.join(args.output_dir, os.path.splitext(name)[0] + ".mp4")
            nb.transcode(lib, os.path.join(args.input_dir, name), dst,
                         args.size, args.size)
            count += 1
        print(f"transcoded {count} videos to {args.output_dir}")
    elif args.dataset == "activitynet_tal":
        import os

        os.makedirs(args.output_dir, exist_ok=True)
        train, val, test, classes = convert_activitynet_tal(
            args.input, args.relative_time, args.save_float
        )
        save_jsonl(train, os.path.join(args.output_dir, "anet_tal_train.jsonl"))
        save_jsonl(val, os.path.join(args.output_dir, "anet_tal_val.jsonl"))
        save_jsonl(test, os.path.join(args.output_dir, "anet_tal_test.jsonl"))
        with open(os.path.join(args.output_dir, "classes.txt"), "w") as f:
            for c in classes:
                f.write(c + "\n")
        print(f"wrote {len(train)}/{len(val)}/{len(test)} records, {len(classes)} classes")


if __name__ == "__main__":
    main()
