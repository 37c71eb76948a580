"""Unit tests for the from-scratch C++ BWT block codec (native/codec.cpp),
the libbsc-role host stage (reference: src/bsc.cpp, libbsc/)."""

import bz2

import numpy as np
import pytest

from nanospring_tpu.codec import backends as be


@pytest.mark.parametrize("n", [0, 1, 2, 7, 255, 256, 4096, 1 << 17])
def test_nsbwt_roundtrip_random(n):
    rng = np.random.default_rng(n)
    b = rng.integers(0, 256, n).astype(np.uint8).tobytes()
    assert be._nsbwt_d(be._nsbwt_c(b)) == b


def test_nsbwt_roundtrip_structured():
    rng = np.random.default_rng(0)
    cases = [
        rng.choice(list(b"ACGT"), p=[0.3, 0.2, 0.2, 0.3], size=1 << 18)
        .astype(np.uint8).tobytes(),
        (b"ACGTACGGTTA" * 20000),
        b"\x00" * 100000,
        bytes(range(256)) * 400,
    ]
    for b in cases:
        c = be._nsbwt_c(b)
        assert be._nsbwt_d(c) == b


def test_nsbwt_beats_bz2_on_dna():
    rng = np.random.default_rng(1)
    b = rng.choice(list(b"ACGT"), p=[0.3, 0.2, 0.2, 0.3], size=1 << 19).astype(
        np.uint8
    ).tobytes()
    assert len(be._nsbwt_c(b)) < len(bz2.compress(b, 9))


def test_nsbwt_chunked_stream_api():
    rng = np.random.default_rng(2)
    b = rng.choice(list(b"ACGT"), size=1 << 16).astype(np.uint8).tobytes()
    c = be.compress("nsbwt", b)
    assert be.decompress("nsbwt", c) == b


def test_nsbwt_beats_bz2_on_bench_streams():
    """nsbwt must hold the libbsc-stand-in bar on realistic stream mixes
    (VERDICT round-1 #7): >= bz2-9 on genome/type/base shaped data, and a
    wash on the near-entropy pos stream (docs/CODECS.md)."""
    import numpy as np

    rng = np.random.default_rng(7)
    # genome-shaped: 2-bit DNA as ASCII codes 0..3
    genome = rng.integers(0, 4, 1 << 19).astype(np.uint8).tobytes()
    # type-shaped: mostly 's' with i/d sprinkles and newline separators
    t = rng.choice(np.frombuffer(b"sid\n", np.uint8),
                   p=[0.62, 0.18, 0.18, 0.02], size=1 << 19)
    types = t.astype(np.uint8).tobytes()
    # base-shaped: random 0..3 codes (substituted/inserted bases)
    bases = rng.integers(0, 4, 1 << 18).astype(np.uint8).tobytes()
    for name, data in (("genome", genome), ("type", types), ("base", bases)):
        ns = len(be.compress("nsbwt", data))
        bz = len(bz2.compress(data, 9))
        assert ns <= bz * 1.02, (name, ns, bz)


def test_nslz_roundtrip_structured():
    """From-scratch LZ77 + range coder (native/codec.cpp ns_lz_*, the
    fast-lzma2 role)."""
    import numpy as np

    rng = np.random.default_rng(0)
    cases = [
        rng.choice(list(b"ACGT"), p=[0.3, 0.2, 0.2, 0.3], size=1 << 18)
        .astype(np.uint8).tobytes(),
        b"ACGTACGGTTA" * 20000,
        b"\x00" * 100000,
        rng.integers(0, 256, 1 << 17).astype(np.uint8).tobytes(),
        b"",
        b"A",
        bytes(range(256)) * 40,
    ]
    for b in cases:
        c = be.compress("nslz", b)
        assert be.decompress("nslz", c) == b


def test_nslz_within_2pct_of_lzma_on_owned_streams():
    """The VERDICT acceptance bar for the LZMA-class stage: within 2% of
    stdlib lzma preset-6 on the streams it owns (docs/CODECS.md measures
    the real bench streams; this guards the shape)."""
    import lzma

    import numpy as np

    rng = np.random.default_rng(5)
    # base-shaped: DNA codes with mild structure
    base = rng.choice(list(b"ACGT"), p=[0.3, 0.2, 0.2, 0.3],
                      size=1 << 19).astype(np.uint8).tobytes()
    # pos-shaped: LEB128 varints of geometric run lengths
    runs = rng.geometric(1.0 / 40, size=1 << 17)
    out = bytearray()
    for v in runs:
        v = int(v)
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
    pos = bytes(out)
    for name, data in (("base", base), ("pos", pos)):
        ns = len(be.compress("nslz", data))
        lz = len(lzma.compress(data, preset=6))
        assert ns <= lz * 1.02, (name, ns, lz)


def test_nsbwt_beats_lzma6_on_owned_bench_streams():
    """Round-3 bar (VERDICT #6): nsbwt (LZP + BWT + contexted order-1/2
    coders) must beat stdlib lzma-6 on the streams it owns — measured on
    the real serializer output of the 60 Mb bench in docs/CODECS.md; this
    guard re-checks the shapes that used to lose (genome with inter-contig
    overlaps, pos varints)."""
    import lzma

    rng = np.random.default_rng(11)
    FILT = [{"id": lzma.FILTER_LZMA2, "preset": 6}]
    # genome-shaped like real serializer output: contig consensi tile a
    # genome with ~30% overlap between neighbors (the case LZP exists
    # for); overlaps are polished consensus, so divergence is low (~0.2%)
    ref = rng.integers(65, 69, 1 << 19).astype(np.uint8)
    parts = []
    step, ln = 40_000, 56_000
    for c in range(11):
        chunk = ref[c * step: c * step + ln].copy()
        mut = rng.random(len(chunk)) < 0.002
        chunk[mut] = rng.integers(65, 69, int(mut.sum()))
        parts.append(chunk)
        parts.append(np.array([10], np.uint8))
    genome = np.concatenate(parts).tobytes()
    # pos-shaped: LEB128 varints of geometric gaps
    gaps = rng.geometric(0.02, 1 << 17)
    out = []
    for g in gaps:
        g = int(g)
        while g >= 0x80:
            out.append((g & 0x7F) | 0x80)
            g >>= 7
        out.append(g)
    pos = bytes(out)
    # the authoritative numbers are the real serializer streams
    # (docs/CODECS.md: genome 584,808 vs lzma 598,045; pos 1,573,071 vs
    # 1,584,276); these synthetic shapes guard the win on genome and a
    # wash bound on the near-entropy pos approximation
    for name, data, bound in (("genome", genome, 1.0), ("pos", pos, 1.02)):
        ns = len(be.compress("nsbwt", data))
        lz = len(lzma.compress(data, format=lzma.FORMAT_RAW, filters=FILT))
        assert ns <= lz * bound, (name, ns, lz)
        assert be.decompress("nsbwt", be.compress("nsbwt", data)) == data


def test_nso1_roundtrip_fuzz():
    """Order-1 range coder (exc-stream owner): exact round trip on random,
    runny, and empty inputs."""
    import numpy as np

    from nanospring_tpu.codec import backends

    rng = np.random.default_rng(12)
    cases = [
        b"",
        b"x",
        rng.integers(0, 256, 70_000, dtype=np.uint8).tobytes(),
        (b"N" * 9999) + bytes(rng.integers(0, 256, 500, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 50_000, dtype=np.uint8)),
    ]
    for data in cases:
        coded = backends.compress_chunk("nso1", data)
        assert backends.decompress_chunk("nso1", coded) == data


def test_nsbwt_u64_chain_path_roundtrip():
    """Inverse-BWT blocks past the 24-bit packing bound (n+1 >= 2^24) take
    the u64 next-pointer path — exercised with a 17 MB low-entropy block."""
    import numpy as np

    from nanospring_tpu.codec import backends

    rng = np.random.default_rng(5)
    n = (1 << 24) + 4096
    # random 4-letter data: entropy-codable (no raw-store escape) but
    # LZP-resistant, so the BWT really runs on all n bytes and the
    # inverse takes the u64 packed-pointer path
    raw = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
    coded = backends.compress_chunk("nsbwt", raw)
    assert backends.decompress_chunk("nsbwt", coded) == raw
