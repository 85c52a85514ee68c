"""Content-defined chunking (functions/cdc.py + dedup.cdc_chunk_table):
window locality, min/max enforcement, the shift-invariance property
that motivates CDC over fixed blocks, and the Spark chunk/dedup path."""
import hashlib

import numpy as np
import pytest

from pydoxtools_spark.functions.cdc import (
    WINDOW,
    chunk_boundaries,
    find_boundary_marker,
    gear_hashes,
)


def _rand(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, n, dtype=np.uint8).tobytes()


def test_hash_window_locality():
    # the hash at position i depends only on the last WINDOW bytes
    tail = _rand(WINDOW, seed=1)
    h1 = gear_hashes(_rand(500, seed=2) + tail)[-1]
    h2 = gear_hashes(_rand(900, seed=3) + tail)[-1]
    assert h1 == h2


def test_boundary_invariants_and_limits():
    data = _rand(300_000)
    bs = chunk_boundaries(data, mask_bits=12, min_size=1024,
                          max_size=8192)
    sizes = np.diff([0] + bs)
    assert bs[-1] == len(data)
    assert sizes.min() >= 1 and sizes.max() <= 8192
    assert (sizes[:-1] >= 1024).all()  # only the tail may be short
    # determinism
    assert bs == chunk_boundaries(data, 12, 1024, 8192)
    # degenerate inputs
    assert chunk_boundaries(b"", 12, 64, 256) == []
    assert chunk_boundaries(b"x", 12, 64, 256) == [1]
    with pytest.raises(ValueError):
        chunk_boundaries(data, 12, 0, 256)
    # all-max forcing on boundary-free content (min > candidate gaps)
    one = chunk_boundaries(b"\x00" * 1000, mask_bits=30, min_size=64,
                           max_size=100)
    assert np.diff([0] + one).max() <= 100 and one[-1] == 1000


def test_shift_invariance_of_shared_run():
    """THE CDC property: a shared byte run produces identical chunk
    hashes in two blobs even at different offsets (fixed-size blocks
    would produce disjoint hashes)."""
    shared = _rand(60_000, seed=7)
    a = _rand(5_000, seed=8) + shared
    b = _rand(9_321, seed=9) + shared
    def chunk_md5s(blob):
        out, last = [], 0
        for end in chunk_boundaries(blob, 11, 512, 8192):
            out.append(hashlib.md5(blob[last:end]).hexdigest())
            last = end
        return out
    ca, cb = chunk_md5s(a), chunk_md5s(b)
    common = set(ca) & set(cb)
    # everything after the first boundary inside `shared` matches
    assert len(common) >= len(ca) * 0.7


def test_marker_forces_boundary():
    m = find_boundary_marker(16)
    assert len(m) == WINDOW
    for pre in (b"", _rand(333, seed=4)):
        bs = chunk_boundaries(pre + m, mask_bits=16, min_size=1,
                              max_size=10**9)
        assert len(pre) + WINDOW in bs


def test_cdc_chunk_table_and_stats(spark):
    from pydoxtools_spark.operators.dedup import (
        cdc_chunk_table,
        cdc_dedup_stats,
    )

    m = find_boundary_marker(16)
    seg = [(b"segment-%d-" % p) * 40 + m for p in range(3)]  # 504 B
    blob1 = seg[0] + seg[1] + seg[2]
    blob2 = seg[2] + seg[0] + seg[0]   # shares all three segments
    blobs = spark.createDataFrame(
        [("b1", bytearray(blob1)), ("b2", bytearray(blob2))],
        "ref string, content binary")
    chunks = cdc_chunk_table(blobs, mask_bits=16,
                             min_size=len(seg[0]), max_size=4096)
    rows = chunks.collect()
    assert len(rows) == 6  # 3 segments per blob, marker-exact splits
    md5s = {(r["ref"], r["chunk_idx"]): r["chunk_md5"] for r in rows}
    assert md5s[("b1", 0)] == md5s[("b2", 1)] == md5s[("b2", 2)]
    assert md5s[("b1", 2)] == md5s[("b2", 0)]
    assert all(r["size"] == len(seg[0]) for r in rows)
    stats = cdc_dedup_stats(chunks).collect()[0]
    assert stats["unique_chunks"] == 3 and stats["total_chunks"] == 6
    assert stats["dedup_ratio"] == 2.0
