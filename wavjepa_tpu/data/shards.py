"""WebDataset-style tar-shard ingestion, first-party.

The reference streams AudioSet/LibriSpeech from WebDataset tar shards with
node/worker splitting (/root/reference/data_modules/WebAudioDataModule.py:
101-119). This module reimplements the on-disk contract — tar archives whose
members share a basename key with extension-separated payloads — plus
deterministic shard→(host, worker) assignment replicating the
split_by_node / split_by_worker semantics, without the webdataset
dependency.
"""

from __future__ import annotations

import re
import tarfile
from pathlib import Path
from typing import Iterator, Sequence

_BRACE_RE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def expand_shard_pattern(pattern: str) -> list[str]:
    """Expand WebDataset brace notation: 'shard-{000000..000019}.tar' →
    20 zero-padded paths. Plain paths (or comma-joined lists) pass through."""
    if "," in pattern:
        out: list[str] = []
        for part in pattern.split(","):
            out.extend(expand_shard_pattern(part.strip()))
        return out
    match = _BRACE_RE.search(pattern)
    if not match:
        return [pattern]
    lo, hi = match.group(1), match.group(2)
    width = len(lo)
    prefix, suffix = pattern[: match.start()], pattern[match.end() :]
    return [
        f"{prefix}{i:0{width}d}{suffix}" for i in range(int(lo), int(hi) + 1)
    ]


def split_shards(
    shards: Sequence[str],
    host_id: int = 0,
    num_hosts: int = 1,
    worker_id: int = 0,
    num_workers: int = 1,
) -> list[str]:
    """Deterministic two-level round-robin: shards striped over hosts, then
    over workers within the host — the reference's split_by_node +
    split_by_worker composition."""
    per_host = list(shards[host_id::num_hosts])
    return per_host[worker_id::num_workers]


def _sample_key(name: str) -> tuple[str, str]:
    """tar member name → (sample key, extension). Extension is everything
    after the first dot of the basename (webdataset convention)."""
    path = Path(name)
    base = path.name
    if "." in base:
        key, ext = base.split(".", 1)
    else:
        key, ext = base, ""
    return str(path.parent / key), ext.lower()


def iter_tar_samples(path: str) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Stream (key, {ext: payload}) groups from one tar shard. Members are
    grouped by consecutive identical keys (shards are written grouped)."""
    with tarfile.open(path, mode="r|*") as tar:
        current_key: str | None = None
        current: dict[str, bytes] = {}
        for member in tar:
            if not member.isfile():
                continue
            key, ext = _sample_key(member.name)
            payload = tar.extractfile(member)
            if payload is None:
                continue
            data = payload.read()
            if current_key is None:
                current_key = key
            if key != current_key:
                if current:
                    yield current_key, current
                current_key, current = key, {}
            current[ext] = data
        if current_key is not None and current:
            yield current_key, current


def iter_shard_samples(
    shards: Sequence[str],
    repeat: bool = True,
    handler: str = "warn",
) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Iterate samples over many shards, optionally forever. Corrupt shards
    are skipped with a warning (reference wds.warn_and_continue)."""
    while True:
        for shard in shards:
            try:
                yield from iter_tar_samples(shard)
            except (tarfile.TarError, OSError) as exc:
                if handler == "raise":
                    raise
                print(f"[data] skipping corrupt shard {shard}: {exc}", flush=True)
        if not repeat:
            return
