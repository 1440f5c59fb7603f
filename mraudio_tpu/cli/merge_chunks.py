"""Merge per-chunk prediction JSONLs into one submission file.

Counterpart of the fan-in step for ``--num-chunks`` sharded inference
(the reference parsed the flags but never sharded, ``evaluate.py:72-73``).
Duplicate qids (overlapping chunks, reruns) keep the last occurrence.
"""

from __future__ import annotations

import argparse
import json


def merge(chunk_paths: list[str]) -> list[dict]:
    by_qid: dict = {}
    order: list = []
    for path in chunk_paths:
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                record = json.loads(line)
                if record["qid"] not in by_qid:
                    order.append(record["qid"])
                by_qid[record["qid"]] = record
    return [by_qid[qid] for qid in order]


def main(argv=None):
    parser = argparse.ArgumentParser(description="merge chunked predictions")
    parser.add_argument("--output", required=True)
    parser.add_argument("chunks", nargs="+")
    args = parser.parse_args(argv)
    records = merge(args.chunks)
    with open(args.output, "w") as f:
        for record in records:
            f.write(json.dumps(record) + "\n")
    print(f"merged {len(records)} records from {len(args.chunks)} chunks")


if __name__ == "__main__":
    main()
