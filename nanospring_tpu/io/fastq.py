"""Streaming FASTQ / gzipped-FASTQ sequence ingestion.

Equivalent role to the reference's ReadData::loadFromFastqFile (reference:
src/ReadData.cpp:95-142 high-mem, :156-235 low-mem), which uses
boost::iostreams for gzip. Here: chunked byte reads + C-speed line splitting
(no per-base Python), gzip via the stdlib (zlib-backed).

Only sequence lines (line index % 4 == 1) are kept — like the reference,
identifiers and quality values are discarded (README.md:5).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import numpy as np

_CHUNK = 32 << 20  # 32 MB read chunks


def _open_maybe_gzip(path: str) -> io.BufferedReader:
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f, "rb")  # type: ignore[return-value]
    return f


def iter_sequence_batches(
    path: str, batch_bytes: int = 64 << 20
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (ascii_buffer, lengths) batches of read sequences.

    ascii_buffer is a flat uint8 array of the concatenated sequence bytes;
    lengths is int64 per read. Batches are cut at ~batch_bytes of sequence.
    """
    buf: list[bytes] = []
    buf_bytes = 0
    lengths: list[int] = []

    with _open_maybe_gzip(path) as f:
        remainder = b""
        line_idx = 0
        while True:
            chunk = f.read(_CHUNK)
            if not chunk:
                break
            chunk = remainder + chunk
            lines = chunk.split(b"\n")
            remainder = lines.pop()  # possibly-incomplete tail
            for line in lines:
                if line_idx % 4 == 1:
                    if line.endswith(b"\r"):
                        line = line[:-1]
                    buf.append(line)
                    lengths.append(len(line))
                    buf_bytes += len(line)
                line_idx += 1
            if buf_bytes >= batch_bytes:
                yield _emit(buf, lengths)
                buf, lengths, buf_bytes = [], [], 0
        # trailing line without newline
        if remainder and line_idx % 4 == 1:
            if remainder.endswith(b"\r"):
                remainder = remainder[:-1]
            buf.append(remainder)
            lengths.append(len(remainder))
    if lengths:
        yield _emit(buf, lengths)


def _emit(buf: list[bytes], lengths: list[int]) -> tuple[np.ndarray, np.ndarray]:
    flat = np.frombuffer(b"".join(buf), dtype=np.uint8)
    return flat, np.asarray(lengths, dtype=np.int64)


def count_reads(path: str) -> int:
    n = 0
    for _, lengths in iter_sequence_batches(path):
        n += len(lengths)
    return n
