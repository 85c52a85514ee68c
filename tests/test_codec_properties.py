"""Hypothesis property tests over the r6 codec ring: every
writer/reader pair must round-trip EXACTLY on arbitrary valid inputs
(they share tables/layout, so the properties target the parts
example tests undersample — odd geometries, dense/sparse ink, random
palettes, chained make-ups, stride padding, byte orders)."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# shared small-geometry strategies: codecs are O(pixels), keep shapes
# modest so 60+ examples stay fast
_dims = st.tuples(st.integers(1, 24), st.integers(1, 40))


@given(_dims, st.floats(0.0, 1.0), st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_ccitt_g4_roundtrip_property(dims, density, rnd):
    from pydoxtools_spark.functions.ccitt import (
        build_ccitt_g4, parse_ccitt_g4)

    h, w = dims
    rng = np.random.default_rng(rnd.randrange(2**32))
    ink = rng.random((h, w)) < density
    out = parse_ccitt_g4(build_ccitt_g4(ink), columns=w, rows=h)
    np.testing.assert_array_equal(out, ink)


@given(_dims, st.integers(1, 256), st.booleans(),
       st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_property(dims, n_colors, interlace, rnd):
    from pydoxtools_spark.functions.gif import build_gif, parse_gif

    h, w = dims
    rng = np.random.default_rng(rnd.randrange(2**32))
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
    gw, gh, px = parse_gif(build_gif(idx, pal, interlace=interlace))
    assert (gw, gh) == (w, h)
    np.testing.assert_array_equal(px, pal[idx])


@given(_dims, st.sampled_from(["none", "lzw", "packbits"]),
       st.sampled_from(["II", "MM"]), st.integers(1, 9),
       st.booleans(), st.randoms(use_true_random=False))
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip_property(dims, comp, order, rps, gray, rnd):
    from pydoxtools_spark.functions.tiff import build_tiff, parse_tiff

    h, w = dims
    rng = np.random.default_rng(rnd.randrange(2**32))
    px = rng.integers(0, 256, (h, w) if gray else (h, w, 3),
                      dtype=np.uint8)
    data = build_tiff(px, compression=comp, byte_order=order,
                      rows_per_strip=rps,
                      predictor=2 if comp == "lzw" else 1)
    tw, th, out = parse_tiff(data)
    assert (tw, th) == (w, h)
    exp = np.repeat(px[:, :, None], 3, axis=2) if gray else px
    np.testing.assert_array_equal(out, exp)


@given(st.integers(1, 3), _dims, st.integers(1, 60),
       st.randoms(use_true_random=False))
@settings(max_examples=40, deadline=None)
def test_avi_roundtrip_property(n, dims, fps, rnd):
    from pydoxtools_spark.functions.avi import (
        build_avi, parse_avi_frame, parse_avi_meta)

    h, w = dims
    rng = np.random.default_rng(rnd.randrange(2**32))
    fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    data = build_avi(fr, fps=fps)
    meta = parse_avi_meta(data)
    assert (meta["width"], meta["height"], meta["fps"],
            meta["n_frames"]) == (w, h, fps, n)
    for i in range(n):
        np.testing.assert_array_equal(parse_avi_frame(data, i, meta),
                                      fr[i])


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=100, deadline=None)
def test_packbits_roundtrip_property(raw):
    from pydoxtools_spark.functions.tiff import (
        packbits_decode, packbits_encode)

    assert packbits_decode(packbits_encode(raw)) == raw


@given(st.lists(st.tuples(
    st.sampled_from(["warcinfo", "response", "resource", "conversion"]),
    st.binary(min_size=0, max_size=500)), min_size=1, max_size=6),
    st.booleans())
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_property(recs, gz):
    from pydoxtools_spark.functions.warc import (
        build_warc, parse_warc, warc_type)

    built = [({"WARC-Type": t, "WARC-Record-ID": f"<urn:uuid:{i}>"}, b)
             for i, (t, b) in enumerate(recs)]
    out = parse_warc(build_warc(built, gzip_members=gz))
    assert [warc_type(h) for h, _ in out] == [t for t, _ in recs]
    assert [p for _, p in out] == [b for _, b in recs]


@given(st.binary(min_size=0, max_size=20000),
       st.integers(6, 14), st.integers(1, 512))
@settings(max_examples=60, deadline=None)
def test_cdc_partition_property(data, mask_bits, min_size):
    from pydoxtools_spark.functions.cdc import chunk_boundaries

    max_size = min_size * 8
    bs = chunk_boundaries(data, mask_bits, min_size, max_size)
    sizes = np.diff([0] + bs)
    assert sizes.sum() == len(data)
    assert len(bs) == 0 or bs[-1] == len(data)
    assert all(s <= max_size for s in sizes)
    # every non-final chunk is either candidate-cut (>= min_size) or
    # max-forced (== max_size); only the tail may be short
    assert all(s >= min_size or s == max_size or i == len(sizes) - 1
               for i, s in enumerate(sizes))
