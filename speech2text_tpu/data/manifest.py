"""JSONL manifest loading (NeMo style), duration filtering, segments.

Data contract parity with reference dataset/dataset.py:23-107:
  each line: {"audio_filepath": ..., "duration": seconds, "text": ...,
              optional "spk_id", optional "offset"/"segment" fields}
Entries outside [dur_min_filter, dur_max_filter] are dropped; total/min/max
duration stats are kept for the bucket batcher.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Iterator, List


@dataclasses.dataclass
class ManifestStats:
    num_utts: int
    total_duration: float
    min_duration: float
    max_duration: float


def load_manifest(
    path: str,
    dur_min_filter: float = 0.0,
    dur_max_filter: float = float("inf"),
) -> List[Dict[str, Any]]:
    entries: List[Dict[str, Any]] = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            item = json.loads(line)
            dur = float(item.get("duration", 0.0))
            if dur_min_filter <= dur <= dur_max_filter:
                entries.append(item)
    return entries


def manifest_stats(entries: List[Dict[str, Any]]) -> ManifestStats:
    if not entries:
        return ManifestStats(0, 0.0, 0.0, 0.0)
    durs = [float(e["duration"]) for e in entries]
    return ManifestStats(len(entries), sum(durs), min(durs), max(durs))


def save_manifest(entries: List[Dict[str, Any]], path: str) -> None:
    with open(path, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")


def iter_text(entries: List[Dict[str, Any]]) -> Iterator[str]:
    for e in entries:
        if "text" in e:
            yield e["text"]
