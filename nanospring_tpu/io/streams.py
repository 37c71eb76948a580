"""Edit-script stream serialization — the archive's seven-stream format.

Same information decomposition as the reference archive (reference:
src/ConsensusGraph.cpp:979-1178, include/ConsensusGraph.h:479-497, layout
documented in SURVEY.md §2.2), re-specified cleanly:

- ``genome``      newline-separated consensus strings, one per contig.
- ``id``          4-byte LE uint32 wrapping deltas of read ids: all contig
                  member ids (contig order), then all lone-read ids.
- ``pos``         LEB128 varints. Per contig read:
                  [start_pos] [head_ins] [run_0 .. run_{E-1}] [final_run] [tail_ins]
                  where E = number of edit tokens for that read in ``type``.
- ``type``        edit tokens 'i'/'d'/'s' per read, '\\n' terminates a read.
- ``base``        literal bases: head-insert run, then each 'i'/'s' base in
                  script order, then tail-insert run, per read.
- ``complement``  'n'/'c' per contig read; '\\n' after each contig.
- ``lone``        newline-separated un-assembled read sequences.
- ``exc``         non-ACGT exception triples (delta read id, pos varints +
                  raw byte) — our addition for strict byte-losslessness.

Replay semantics (the decoder contract): walk the consensus from start_pos;
an unchanged run u copies u consensus bases; 's' consumes one consensus base
and emits a substituted base from ``base``; 'd' consumes one consensus base,
emits nothing; 'i' emits one ``base`` byte without consuming consensus.
head_ins/tail_ins bases wrap the aligned region. If complement is 'c' the
script reconstructs the reverse complement of the original read.

All encode/decode paths below are numpy-vectorized (no per-base Python).
"""

from __future__ import annotations

import numpy as np

STREAM_NAMES = ("genome", "id", "pos", "type", "base", "complement", "lone", "exc")


# ---------------------------------------------------------------------------
# Vectorized LEB128 varints
# ---------------------------------------------------------------------------

_MAX_VARINT_BYTES = 10  # supports full uint64


def _native_lib():
    try:
        from .. import native

        return native.get_lib()
    except Exception:
        return None


def encode_varints(values: np.ndarray) -> np.ndarray:
    """uint64/int64 array -> concatenated LEB128 bytes (uint8 array)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8)
    lib = _native_lib()
    if lib is not None:
        import ctypes

        v = np.ascontiguousarray(v)
        # exact output size first (cheap vectorized bit-length pass) so the
        # buffer is sized to the stream, not 10 B/value worst case
        total = int(v.size)
        tmp = v >> np.uint64(7)
        while tmp.any():
            total += int(np.count_nonzero(tmp))
            tmp >>= np.uint64(7)
        out = np.empty(total, dtype=np.uint8)
        n = lib.ns_varint_encode(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_int64(v.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        assert n == total
        return out
    # number of bytes per value: ceil(bitlen/7), min 1
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    starts = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nb, out=starts[1:])
    out = np.zeros(int(starts[-1]), dtype=np.uint8)
    # write byte k of every value that has >= k+1 bytes
    rem = v.copy()
    active = np.ones(v.shape, dtype=bool)
    for k in range(_MAX_VARINT_BYTES):
        if not active.any():
            break
        idx = starts[:-1][active] + k
        more = nb[active] > (k + 1)
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        byte = byte | (more.astype(np.uint8) << 7)
        out[idx] = byte
        rem[active] = rem[active] >> np.uint64(7)
        active = active & (nb > (k + 1))
    return out


def decode_varints(buf: np.ndarray) -> np.ndarray:
    """Concatenated LEB128 bytes -> uint64 array of all values in the buffer."""
    buf = np.asarray(buf, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros(0, dtype=np.uint64)
    lib = _native_lib()
    if lib is not None:
        import ctypes

        buf = np.ascontiguousarray(buf)
        cap = int(np.count_nonzero(buf < 128))
        out = np.empty(cap, dtype=np.uint64)
        n = lib.ns_varint_decode(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(buf.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        return out[:n]
    is_end = buf < 128
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nvals = len(ends)
    vals = np.zeros(nvals, dtype=np.uint64)
    nb = ends - starts + 1
    maxb = int(nb.max())
    for k in range(maxb):
        has = nb > k
        b = buf[starts[has] + k].astype(np.uint64)
        vals[has] |= (b & np.uint64(0x7F)) << np.uint64(7 * k)
    return vals


# ---------------------------------------------------------------------------
# id stream: 4-byte LE wrapping deltas (reference semantics,
# src/ConsensusGraph.cpp:994-1001 / src/Decompressor.cpp:137-143)
# ---------------------------------------------------------------------------

def encode_id_stream(ids: np.ndarray) -> np.ndarray:
    # the id stream is 4-byte (read_t) like the reference, which hard-errors
    # past uint32 (src/ReadData.cpp:122-124); a silent cast would corrupt
    if np.asarray(ids).size and int(np.max(ids)) >= 1 << 32:
        raise ValueError(
            f"read id {int(np.max(ids))} exceeds the 4-byte id-stream format "
            "(datasets beyond 2^32 reads need sharded archives)")
    ids = np.asarray(ids, dtype=np.uint32)
    deltas = np.empty_like(ids)
    if ids.size:
        deltas[0] = ids[0]
        deltas[1:] = ids[1:] - ids[:-1]  # uint32 wrap-around is intended
    return deltas.view(np.uint8) if ids.size else np.zeros(0, dtype=np.uint8)


def decode_id_stream(buf: np.ndarray) -> np.ndarray:
    deltas = np.asarray(buf, dtype=np.uint8).view(np.uint32)
    with np.errstate(over="ignore"):
        return np.cumsum(deltas, dtype=np.uint32)


# ---------------------------------------------------------------------------
# exc stream
# ---------------------------------------------------------------------------

def encode_exc_stream(
    exc_read: np.ndarray, exc_pos: np.ndarray, exc_byte: np.ndarray
) -> np.ndarray:
    """v2 layout: [varint 0][varint 2][varint n][id deltas][pos deltas][bytes].

    The leading varint 0 (impossible as a v1 count unless the stream ends
    there) marks the versioned layout. Positions are delta-coded within a
    read (ingestion order is ascending): for ~2.5 exceptions/read the
    within-read gaps carry ~1 bit/exception less than absolute positions,
    which is what pushed the nso1-coded exc stream past lzma-6
    (docs/CODECS.md, round-4 verdict ask #7).
    """
    n = len(exc_read)
    if n == 0:
        return encode_varints(np.array([0], dtype=np.uint64))
    head = encode_varints(np.array([0, 2, n], dtype=np.uint64))
    er = np.asarray(exc_read, dtype=np.int64)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = er[0]
    deltas[1:] = np.diff(er).astype(np.uint64)
    ids = encode_varints(deltas)
    ep = np.asarray(exc_pos, dtype=np.int64)
    same = np.zeros(n, dtype=bool)
    same[1:] = er[1:] == er[:-1]
    pd = ep.copy()
    pd[same] = ep[same] - np.concatenate([[0], ep[:-1]])[same]
    poss = encode_varints(pd.astype(np.uint64))
    return np.concatenate([head, ids, poss, np.asarray(exc_byte, dtype=np.uint8)])


def decode_exc_stream(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    buf = np.asarray(buf, dtype=np.uint8)
    # varints: count head, then n id-deltas, then n positions; the final
    # n raw bytes are NOT varints, so decode the varint region only.
    is_end = buf < 128
    ends = np.flatnonzero(is_end)
    first = int(decode_varints(buf[: ends[0] + 1])[0])
    version = 1
    skip = 1  # varints before the id-delta section
    if first == 0:
        if len(ends) == 1:  # v1 empty stream
            return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.uint8))
        version = int(decode_varints(buf[ends[0] + 1: ends[1] + 1])[0])
        n = int(decode_varints(buf[ends[1] + 1: ends[2] + 1])[0])
        skip = 3
    else:
        n = first
    if n == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.uint8),
        )
    last_varint_end = ends[skip - 1 + 2 * n]
    vals = decode_varints(buf[: last_varint_end + 1])
    deltas = vals[skip: skip + n].astype(np.int64)
    exc_read = np.cumsum(deltas)
    exc_pos = vals[skip + n: skip + 2 * n].astype(np.int64)
    exc_byte = buf[last_varint_end + 1: last_varint_end + 1 + n]
    if version >= 2:
        # undo within-read position deltas: segmented cumsum per read
        same = np.zeros(n, dtype=bool)
        same[1:] = exc_read[1:] == exc_read[:-1]
        c = np.cumsum(exc_pos)
        starts = np.flatnonzero(~same)
        offs = c[starts] - exc_pos[starts]
        exc_pos = c - np.repeat(offs, np.diff(np.append(starts, n)))
    return exc_read, exc_pos, exc_byte


# ---------------------------------------------------------------------------
# Stream buffers
# ---------------------------------------------------------------------------

class StreamSet:
    """In-memory accumulation of the archive streams as byte chunks."""

    def __init__(self):
        self._chunks: dict[str, list[bytes]] = {name: [] for name in STREAM_NAMES}

    def append(self, name: str, data: bytes | np.ndarray) -> None:
        if isinstance(data, np.ndarray):
            data = data.tobytes()
        self._chunks[name].append(data)

    def get(self, name: str) -> bytes:
        return b"".join(self._chunks[name])

    def sizes(self) -> dict[str, int]:
        return {n: sum(len(c) for c in self._chunks[n]) for n in STREAM_NAMES}
