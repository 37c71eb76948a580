"""Archive container: one ``.nstpu`` file = tar of metaData + coded streams.

Same container idea as the reference (tar of per-stream files + metaData,
reference: src/Compressor.cpp:146-153 — which shells out to /bin/tar; here we
use the stdlib tarfile, no subprocess). metaData is JSON carrying the counts
the decompressor needs (reference's key=value metaData at
src/Consensus.cpp:374-385) plus the codec used per stream.
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import json
import tarfile

import numpy as np

from ..codec import backends
from . import streams as st

FORMAT_VERSION = 1
_META_NAME = "meta.json"


def write_archive(
    out_path: str,
    stream_set: st.StreamSet,
    meta: dict,
    codec_map: dict[str, str],
    pool: cf.Executor | None = None,
) -> dict[str, int]:
    """Compress each stream with its codec and tar everything up.

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

    with tarfile.open(out_path, "w") as tar:
        mbytes = json.dumps(meta, indent=0).encode()
        info = tarfile.TarInfo(_META_NAME)
        info.size = len(mbytes)
        tar.addfile(info, io.BytesIO(mbytes))
        for name in st.STREAM_NAMES:
            data = coded[name]
            sizes[name] = len(data)
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return sizes


def read_archive(
    path: str, pool: cf.Executor | None = None
) -> tuple[dict, dict[str, np.ndarray]]:
    """Returns (meta, {stream name -> raw uint8 array})."""
    with tarfile.open(path, "r") as tar:
        meta = json.loads(tar.extractfile(_META_NAME).read())
        coded = {
            name: tar.extractfile(name).read()
            for name in st.STREAM_NAMES
            if name in tar.getnames()
        }
    codec_map = meta["codecs"]

    def _job(name: str) -> tuple[str, np.ndarray]:
        raw = backends.decompress(codec_map[name], coded[name])
        return name, np.frombuffer(raw, dtype=np.uint8)

    if pool is not None:
        out = dict(pool.map(_job, coded.keys()))
    else:
        out = dict(_job(n) for n in coded)
    return meta, out
