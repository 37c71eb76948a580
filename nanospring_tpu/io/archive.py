"""Archive container: one ``.nstpu`` file = meta + coded streams.

The reference tars per-stream files + metaData by shelling out to /bin/tar
(reference: src/Compressor.cpp:146-153, src/Decompressor.cpp:32-41). A tar
costs 512 B per member header, 512 B block rounding per member, and a
10 KiB end-of-archive pad — pure ratio loss on small archives — so the
native container here is a minimal length-prefixed concat:

    magic "NSTPU1\\n" | u64 meta_len | meta JSON |
    repeat: u8 name_len | name | u64 data_len | data

meta is JSON carrying the counts the decompressor needs (the reference's
key=value metaData, src/Consensus.cpp:374-385) plus the codec per stream.
``read_archive`` still reads the old tar layout for archives written before
this format.
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import struct

import numpy as np

from ..codec import backends
from . import streams as st

FORMAT_VERSION = 2
_MAGIC = b"NSTPU1\n"
_META_NAME = "meta.json"


def write_archive(
    out_path: str,
    stream_set: st.StreamSet,
    meta: dict,
    codec_map: dict[str, str],
    pool: cf.Executor | None = None,
) -> dict[str, int]:
    """Compress each stream with its codec and concatenate everything.

    Returns the compressed size per stream (for observability/ratio stats).
    """
    meta = dict(meta)
    meta["format_version"] = FORMAT_VERSION
    meta["codecs"] = codec_map
    sizes: dict[str, int] = {}

    def _job(name: str) -> tuple[str, bytes]:
        raw = stream_set.get(name)
        return name, backends.compress(codec_map[name], raw)

    if pool is not None:
        coded = dict(pool.map(_job, st.STREAM_NAMES))
    else:
        coded = dict(_job(n) for n in st.STREAM_NAMES)

    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        mbytes = json.dumps(meta, indent=0).encode()
        f.write(struct.pack("<Q", len(mbytes)))
        f.write(mbytes)
        for name in st.STREAM_NAMES:
            data = coded[name]
            sizes[name] = len(data)
            nb = name.encode()
            f.write(struct.pack("<B", len(nb)))
            f.write(nb)
            f.write(struct.pack("<Q", len(data)))
            f.write(data)
    return sizes


def _read_native(path: str) -> tuple[dict, dict[str, bytes]]:
    with open(path, "rb") as f:
        assert f.read(len(_MAGIC)) == _MAGIC
        (mlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(mlen))
        coded: dict[str, bytes] = {}
        while True:
            nl = f.read(1)
            if not nl:
                break
            name = f.read(nl[0]).decode()
            (dlen,) = struct.unpack("<Q", f.read(8))
            coded[name] = f.read(dlen)
    return meta, coded


def _read_tar(path: str) -> tuple[dict, dict[str, bytes]]:
    import tarfile

    with tarfile.open(path, "r") as tar:
        meta = json.loads(tar.extractfile(_META_NAME).read())
        names = tar.getnames()
        coded = {
            name: tar.extractfile(name).read()
            for name in st.STREAM_NAMES
            if name in names
        }
    return meta, coded


def read_archive(
    path: str, pool: cf.Executor | None = None
) -> tuple[dict, dict[str, np.ndarray]]:
    """Returns (meta, {stream name -> raw uint8 array})."""
    with open(path, "rb") as f:
        is_native = f.read(len(_MAGIC)) == _MAGIC
    meta, coded = _read_native(path) if is_native else _read_tar(path)
    codec_map = meta["codecs"]

    def _job(name: str) -> tuple[str, np.ndarray]:
        raw = backends.decompress(codec_map[name], coded[name])
        return name, np.frombuffer(raw, dtype=np.uint8)

    if pool is not None:
        out = dict(pool.map(_job, coded.keys()))
    else:
        out = dict(_job(n) for n in coded)
    return meta, out
