"""tar-shard ingestion (loaders.tar_members) and WebDataset sample
grouping (loaders.webdataset_samples): member explosion, key/extension
convention (first dot of the basename), in-kernel grouping, gz
transport, containment."""
import io
import tarfile

import numpy as np


def _tar(members: dict[str, bytes], gz: bool = False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if gz:
        import zlib

        c = zlib.compressobj(9, zlib.DEFLATED, 31)  # mtime-free gzip
        raw = c.compress(raw) + c.flush()
    return raw


def test_tar_members_explodes_and_contains(spark):
    from pydoxtools_spark.sources.loaders import tar_members

    arc = _tar({"a.txt": b"alpha", "sub/b.bin": b"\x00\x01"})
    rows = [("t.tar", bytearray(arc)),
            ("t.tar.gz", bytearray(_tar({"c.txt": b"gamma"}, gz=True))),
            ("bad.tar", bytearray(b"not a tar at all" * 40))]
    blobs = spark.createDataFrame(rows, "path string, content binary")
    got = {}
    for r in tar_members(blobs).collect():
        got.setdefault(r["ref"], []).append(r)
    g = {r["member"]: bytes(r["content"]) for r in got["t.tar"]}
    assert g == {"a.txt": b"alpha", "sub/b.bin": b"\x00\x01"}
    assert [bytes(r["content"]) for r in got["t.tar.gz"]] == [b"gamma"]
    assert got["bad.tar"][0]["error"] is not None
    # bomb guard
    cap = tar_members(blobs, max_member_bytes=3).collect()
    big = [r for r in cap if r["member"] == "a.txt"][0]
    assert big["content"] is None and "max_member_bytes" in big["error"]


def test_webdataset_sample_grouping(spark):
    from pydoxtools_spark.sources.loaders import webdataset_samples

    shard = _tar({
        "000001.jpg": b"JPGBYTES1",
        "000001.json": b'{"label": 3}',
        "000001.txt": b"a caption",
        "000002.jpg": b"JPGBYTES2",
        "000002.seg.png": b"SEGPNG",       # multi-dot ext stays whole
        "dir/000003.txt": b"nested key",   # key keeps the directory
        "noext": b"skipped",               # dotless: not a sample part
    }, gz=True)
    blobs = spark.createDataFrame([("s0.tar.gz", bytearray(shard))],
                                  "path string, content binary")
    got = {r["key"]: r for r in webdataset_samples(blobs).collect()}
    assert set(got) == {"000001", "000002", "dir/000003"}
    s1 = got["000001"]
    assert s1["n_parts"] == 3
    assert bytes(s1["parts"]["jpg"]) == b"JPGBYTES1"
    assert bytes(s1["parts"]["json"]) == b'{"label": 3}'
    assert bytes(got["000002"]["parts"]["seg.png"]) == b"SEGPNG"
    assert got["dir/000003"]["n_parts"] == 1
    assert all(r["error"] is None for r in got.values())


def test_webdataset_multimodal_parts_decode(spark):
    """The full multimodal-pipeline shape: a WebDataset shard whose
    image parts are REAL codec bytes flows samples -> media rows ->
    media_features decode, no shuffle until features."""
    from pyspark.sql import functions as F

    from pydoxtools_spark.functions.gif import build_gif
    from pydoxtools_spark.functions.media import build_bmp
    from pydoxtools_spark.operators.multimodal import media_features
    from pydoxtools_spark.sources.loaders import webdataset_samples

    bmp = build_bmp(np.full((4, 6, 3), 90, np.uint8))
    gif = build_gif(np.zeros((3, 5), np.uint8),
                    np.array([[60, 60, 60]], np.uint8))
    shard = _tar({"s1.bmp": bmp, "s1.txt": b"cap one",
                  "s2.gif": gif, "s2.txt": b"cap two"})
    blobs = spark.createDataFrame([("w.tar", bytearray(shard))],
                                  "path string, content binary")
    samples = webdataset_samples(blobs).filter("error IS NULL")
    media = samples.select(
        F.concat_ws("#", "ref", "key").alias("media_ref"),
        F.explode("parts").alias("ext", "content")
    ).filter(F.col("ext").isin("bmp", "gif")).select(
        "media_ref", F.lit("image").alias("media_type"), "content",
        F.lit(None).cast("map<string,string>").alias("meta"))
    out = {r["media_ref"].split("#")[1]: r for r in
           media_features(media).collect()}
    assert out["s1"]["mean_level"] == 90
    assert (out["s2"]["width"], out["s2"]["height"]) == (5, 3)
    assert out["s2"]["mean_level"] == 60
