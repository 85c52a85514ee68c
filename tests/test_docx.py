"""docx loader (round 4): from-scratch ECMA-376 parse (reference
PandocToPdxConverter, extract_pandoc.py:98-167) — writer/reader pair,
markdown-twin block mapping, binary dispatch, and the pipeline branch."""

from pyspark.sql import functions as F

from pydoxtools_spark.functions.docx import (
    DocxParseError,
    build_tiny_docx,
    extract_docx_spans,
    is_docx,
)

BLOCKS = [
    ("header", "Doc 7", 1),
    ("text", "Some   body  text here"),
    ("list", ["alpha", "beta 7", "gamma"]),
    ("table", [["a", "b"], ["c 7", "d"]]),
    ("image", "media/image1.png"),
    ("header", "Sub", 2),
    ("text", "tail paragraph"),
]


def test_writer_reader_round_trip_and_determinism():
    data = build_tiny_docx(BLOCKS)
    assert is_docx(data)
    assert data == build_tiny_docx(BLOCKS), "writer must be byte-deterministic"
    assert extract_docx_spans(data) == [
        ("header", "Doc 7", None),
        ("text", "Some body text here", None),
        ("list", "alpha\nbeta 7\ngamma", None),
        ("table", "a | b\nc 7 | d", None),
        ("image", None, "media/image1.png"),
        ("header", "Sub", None),
        ("text", "tail paragraph", None),
    ]


def test_markdown_twin_block_mapping():
    """The same content as markdown and as docx must produce IDENTICAL
    span streams (the block-mapping contract both branches pin)."""
    from pydoxtools_spark.functions.markdown import extract_markdown_spans

    md = "\n".join([
        "# Doc 7", "", "Some body text here", "",
        "- alpha", "- beta 7", "- gamma", "",
        "| a | b |", "| --- | --- |", "| c 7 | d |", "",
        "![img](media/image1.png)", "", "## Sub", "", "tail paragraph",
    ])
    assert extract_markdown_spans(md) == extract_docx_spans(
        build_tiny_docx(BLOCKS))


def test_parse_errors_contained():
    import pytest

    for payload in (b"", b"PK\x03\x04junk", b"%PDF-1.4 nope"):
        assert not is_docx(payload)
        with pytest.raises(DocxParseError):
            extract_docx_spans(payload)


def test_blob_dispatch_probe():
    from pydoxtools_spark.dispatch import (
        TYPE_BINARY, TYPE_DOCX, TYPE_PDF, blob_doc_type, blob_in_kind)
    from pydoxtools_spark.functions.pdfparse import build_tiny_pdf

    docx = build_tiny_docx(BLOCKS)
    pdf = build_tiny_pdf([{"texts": [(0.0, 0.0, 10.0, "x")]}])
    assert blob_doc_type(docx) == TYPE_DOCX
    assert blob_doc_type(pdf) == TYPE_PDF
    assert blob_doc_type(b"\x00\x01\x02") == TYPE_BINARY
    # a plain zip that is not a docx stays binary
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("readme.txt", "hi")
    assert blob_doc_type(buf.getvalue()) == TYPE_BINARY
    assert blob_in_kind(docx) == "docx_bytes"
    assert blob_in_kind(pdf) == "pdf_bytes"


def test_docx_branch_through_extract(spark):
    """docx_bytes spans + doc_blobs side table -> ordered spans with
    running offsets through the SAME extract() pipeline; a broken blob
    becomes a contained error row."""
    from pydoxtools_spark.pipeline import extract
    from pydoxtools_spark.schemas import DOCUMENTS_IN

    good = build_tiny_docx(BLOCKS)
    docs = spark.createDataFrame(
        [{"doc_id": "g", "spans": [
            {"kind": "docx_bytes", "text": None,
             "media_ref": "blob://g", "offset": 0}]},
         {"doc_id": "bad", "spans": [
             {"kind": "docx_bytes", "text": None,
              "media_ref": "blob://bad", "offset": 0}]},
         {"doc_id": "noblob", "spans": [
             {"kind": "docx_bytes", "text": None,
              "media_ref": "blob://missing", "offset": 0}]}],
        schema=DOCUMENTS_IN)
    blobs = spark.createDataFrame(
        [("blob://g", bytearray(good)), ("blob://bad", bytearray(b"PK\x03\x04nope"))],
        "ref string, content binary")
    rows = {r["doc_id"]: r for r in
            extract(spark, docs, None, parallelism=2,
                    doc_blobs=blobs).collect()}
    g = [(s["kind"], s["text"], s["media_ref"], s["offset"])
         for s in rows["g"]["spans"]]
    texts = [t for (_k, t, _r, _o) in g if t]
    assert g[0] == ("header", "Doc 7", None, 0)
    assert g[1][3] == len("Doc 7")  # running offset
    assert ("image", None, "media/image1.png", sum(map(len, texts[:4]))) in g
    assert rows["g"]["error"] is None
    assert rows["bad"]["spans"] == []
    assert "docx_parse_error" in rows["bad"]["error"]
    # missing blob: doc still present, empty spans, no error (pdf_ref
    # convention)
    assert rows["noblob"]["spans"] == [] and rows["noblob"]["error"] is None


def test_ocr_branch_through_extract(spark):
    """image_ref spans + media blobs + batched mock model -> an image
    span followed by the recognized text span (reference chain
    document.py:320-355), with running offsets; a bad raster becomes a
    contained error."""
    from pydoxtools_spark.functions.media import (
        build_text_bmp, read_text_bmp_pixels)
    from pydoxtools_spark.pipeline import extract
    from pydoxtools_spark.schemas import DOCUMENTS_IN

    def model(images):
        return [read_text_bmp_pixels(im) for im in images]

    docs = spark.createDataFrame(
        [{"doc_id": "a", "spans": [
            {"kind": "image_ref", "text": None,
             "media_ref": "scan://a", "offset": 0}]},
         {"doc_id": "junk", "spans": [
             {"kind": "image_ref", "text": None,
              "media_ref": "scan://junk", "offset": 0}]}],
        schema=DOCUMENTS_IN)
    blobs = spark.createDataFrame(
        [("scan://a", bytearray(build_text_bmp("hello scan"))),
         ("scan://junk", bytearray(b"not a bmp"))],
        "ref string, content binary")
    rows = {r["doc_id"]: r for r in
            extract(spark, docs, None, parallelism=2,
                    media_blobs=blobs, ocr_model=model).collect()}
    a = [(s["kind"], s["text"], s["media_ref"], s["offset"])
         for s in rows["a"]["spans"]]
    assert a == [("image", None, "scan://a", 0),
                 ("text", "hello scan", None, 0)]
    assert rows["a"]["error"] is None
    # undecodable raster: image span survives, OCR error contained
    j = [(s["kind"], s["media_ref"]) for s in rows["junk"]["spans"]]
    assert j == [("image", "scan://junk")]
    assert "ocr_error" in rows["junk"]["error"]
    # without a model the branch is absent entirely (plain image span)
    plain = {r["doc_id"]: r for r in
             extract(spark, docs, None, parallelism=2).collect()}
    assert [s["kind"] for s in plain["a"]["spans"]] == ["image"]


def test_odt_writer_reader_and_docx_twin():
    """ODT round trip; identical span stream to the docx rendering of
    the same blocks (the cross-format block-mapping contract)."""
    from pydoxtools_spark.functions.odf import (
        build_tiny_odt, extract_odt_spans, is_odt)

    data = build_tiny_odt(BLOCKS)
    assert is_odt(data)
    assert data == build_tiny_odt(BLOCKS)
    assert extract_odt_spans(data) == extract_docx_spans(
        build_tiny_docx(BLOCKS))
    # docx zip must NOT probe as odt and vice versa
    assert not is_odt(build_tiny_docx(BLOCKS))
    assert not is_docx(data)


def test_epub_rides_html_kernel_in_spine_order():
    from pydoxtools_spark.functions.htmlparse import extract_html_spans
    from pydoxtools_spark.functions.odf import (
        build_tiny_epub, extract_epub_spans, is_epub)

    chs = ["<html><body><h1>One</h1><p>first</p></body></html>",
           "<html><body><h1>Two</h1><p>second</p></body></html>"]
    data = build_tiny_epub(chs)
    assert is_epub(data)
    want = [s for ch in chs for s in extract_html_spans(ch)]
    assert extract_epub_spans(data) == want
    assert [k for (k, _t, _r) in want] == ["header", "text"] * 2


def test_container_branch_probes_actual_format(spark):
    """The container kernel dispatches on the BLOB's real format, not
    the declared in_kind: an odt blob delivered under docx_bytes still
    parses (self-describing containers); junk is a contained error."""
    from pydoxtools_spark.functions.odf import build_tiny_epub, build_tiny_odt
    from pydoxtools_spark.pipeline import extract
    from pydoxtools_spark.schemas import DOCUMENTS_IN

    odt = build_tiny_odt(BLOCKS)
    epub = build_tiny_epub(
        ["<html><body><h1>E</h1><p>chapter text</p></body></html>"])
    docs = spark.createDataFrame(
        [{"doc_id": "odt-as-docx", "spans": [
            {"kind": "docx_bytes", "text": None,
             "media_ref": "b://1", "offset": 0}]},
         {"doc_id": "epub", "spans": [
             {"kind": "epub_bytes", "text": None,
              "media_ref": "b://2", "offset": 0}]}],
        schema=DOCUMENTS_IN)
    blobs = spark.createDataFrame(
        [("b://1", bytearray(odt)), ("b://2", bytearray(epub))],
        "ref string, content binary")
    rows = {r["doc_id"]: r for r in
            extract(spark, docs, None, parallelism=2,
                    doc_blobs=blobs).collect()}
    assert [s["kind"] for s in rows["odt-as-docx"]["spans"]][:2] == [
        "header", "text"]
    assert rows["odt-as-docx"]["error"] is None
    e = [(s["kind"], s["text"]) for s in rows["epub"]["spans"]]
    assert e == [("header", "E"), ("text", "chapter text")]


def test_rtf_round_trip_and_subset_semantics():
    """RTF minimal subset: header/text/table round trip; hex escapes,
    \\u signed-16-bit unicode (CJK goes negative) + surrogate pairs,
    destination groups skipped."""
    from pydoxtools_spark.functions.rtf import (
        RtfParseError, build_tiny_rtf, extract_rtf_spans, is_rtf)

    blocks = [("header", "Doc 7", 1),
              ("text", "body   with 漢字 and 😀"),
              ("table", [["a", "b"], ["c 7", "d"]]),
              ("header", "Sub", 2),
              ("text", "tail")]
    data = build_tiny_rtf(blocks)
    assert is_rtf(data)
    assert data == build_tiny_rtf(blocks)
    assert extract_rtf_spans(data) == [
        ("header", "Doc 7", None),
        ("text", "body with 漢字 and 😀", None),
        ("table", "a | b\nc 7 | d", None),
        ("header", "Sub", None),
        ("text", "tail", None),
    ]
    raw = rb"{\rtf1\ansi{\fonttbl{\f0 X;}}{\*\generator Fake;}{\pard caf\'e9\par}}"
    assert extract_rtf_spans(raw) == [("text", "caf\xe9", None)]
    import pytest
    with pytest.raises(RtfParseError):
        extract_rtf_spans(b"plain text")


def test_rtf_branch_through_extract(spark):
    from pydoxtools_spark.functions.rtf import build_tiny_rtf
    from pydoxtools_spark.pipeline import extract
    from pydoxtools_spark.schemas import DOCUMENTS_IN

    rtf = build_tiny_rtf([("header", "H", 1), ("text", "body text")])
    docs = spark.createDataFrame(
        [{"doc_id": "r", "spans": [
            {"kind": "rtf_bytes", "text": None,
             "media_ref": "b://r", "offset": 0}]}],
        schema=DOCUMENTS_IN)
    blobs = spark.createDataFrame(
        [("b://r", bytearray(rtf))], "ref string, content binary")
    (row,) = extract(spark, docs, None, parallelism=2,
                     doc_blobs=blobs).collect()
    assert [(s["kind"], s["text"], s["offset"]) for s in row["spans"]] == [
        ("header", "H", 0), ("text", "body text", 1)]


def test_cross_format_block_mapping_property():
    """Property: ANY block sequence renders to the SAME span stream
    through the docx and odt writers+parsers (two independent
    container dialects agreeing pins the block-mapping contract), and
    the header/text/table/list subset agrees with rtf too (lists in
    all four container formats since r5 — the r4 verdict's
    cross-format list coverage)."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pydoxtools_spark.functions.odf import build_tiny_odt, extract_odt_spans
    from pydoxtools_spark.functions.rtf import build_tiny_rtf, extract_rtf_spans

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta{", "x&y",
             "<tag>", 'q"q', "漢字"]

    def gen_blocks(rng, with_rich):
        blocks = []
        for _ in range(rng.randint(1, 8)):
            kind = rng.choice(
                ["header", "text", "table", "list"] + (["image"]
                                                       if with_rich else []))
            if kind == "header":
                blocks.append(("header",
                               " ".join(rng.choices(words, k=rng.randint(1, 3))),
                               rng.randint(1, 4)))
            elif kind == "text":
                blocks.append(("text",
                               " ".join(rng.choices(words, k=rng.randint(1, 9)))))
            elif kind == "list":
                blocks.append(("list", [
                    " ".join(rng.choices(words, k=rng.randint(1, 3)))
                    for _ in range(rng.randint(1, 4))]))
            elif kind == "table":
                cols = rng.randint(1, 3)
                blocks.append(("table", [
                    [" ".join(rng.choices(words, k=rng.randint(1, 2)))
                     for _ in range(cols)]
                    for _ in range(rng.randint(1, 3))]))
            else:
                blocks.append(("image", f"media/img{rng.randint(1, 9)}.png"))
        return blocks

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=0, max_value=10**6))
    def check(seed):
        rng = random.Random(seed)
        rich = gen_blocks(rng, with_rich=True)
        assert (extract_docx_spans(build_tiny_docx(rich))
                == extract_odt_spans(build_tiny_odt(rich))), seed
        plain = [b for b in gen_blocks(rng, with_rich=False)]
        assert (extract_rtf_spans(build_tiny_rtf(plain))
                == extract_docx_spans(build_tiny_docx(plain))), seed
        # rtf images (r6): same (kind, text) stream as docx on the
        # RICH blocks; media_refs are positional pict{n} by design
        # (RTF has no named parts)
        rtf_rich = extract_rtf_spans(build_tiny_rtf(rich))
        docx_rich = extract_docx_spans(build_tiny_docx(rich))
        assert ([(k, t) for k, t, _ in rtf_rich]
                == [(k, t) for k, t, _ in docx_rich]), seed
        img_refs = [r for k, _, r in rtf_rich if k == "image"]
        assert img_refs == [f"pict{i + 1}"
                            for i in range(len(img_refs))], seed

    check()


def test_run_resumable_with_container_blobs(spark, tmp_path):
    """Resumability covers the container branch: a docx corpus runs
    through run_resumable(doc_blobs=...), resumes to a no-op, and the
    committed view carries the container spans."""
    from pydoxtools_spark.pipeline import read_extracted, run_resumable
    from pydoxtools_spark.schemas import DOCUMENTS_IN

    docs = spark.createDataFrame(
        [{"doc_id": f"d{i}", "spans": [
            {"kind": "docx_bytes", "text": None,
             "media_ref": f"b://{i}", "offset": 0}]}
         for i in range(6)],
        schema=DOCUMENTS_IN)
    blobs = spark.createDataFrame(
        [(f"b://{i}", bytearray(build_tiny_docx(
            [("header", f"Doc {i}", 1), ("text", f"body {i}")])))
         for i in range(6)],
        "ref string, content binary")
    out = str(tmp_path / "docx_out")
    r1 = run_resumable(spark, docs, None, out, parallelism=2,
                       doc_blobs=blobs)
    assert r1["docs_processed"] == 6
    r2 = run_resumable(spark, docs, None, out, parallelism=2,
                       doc_blobs=blobs)
    assert r2["docs_processed"] == 0
    rows = {r["doc_id"]: [s["text"] for s in r["spans"]]
            for r in read_extracted(spark, out).collect()}
    assert rows["d3"] == ["Doc 3", "body 3"]


def test_extract_files_mixed_directory(spark, tmp_path):
    """One-call directory ingestion (the reference's Document(source)
    experience): mixed pdf/docx/rtf/html/txt files probe to the right
    branches and come back as spans keyed by path."""
    from pydoxtools_spark.functions.pdfparse import build_tiny_pdf
    from pydoxtools_spark.functions.rtf import build_tiny_rtf
    from pydoxtools_spark.pipeline import extract_files

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.pdf").write_bytes(build_tiny_pdf(
        [{"texts": [(72.0, 700.0, 12.0, "pdf text here")]}], compress=True))
    (d / "b.docx").write_bytes(build_tiny_docx(
        [("header", "DocB", 1), ("text", "docx body")]))
    (d / "c.rtf").write_bytes(build_tiny_rtf([("text", "rtf body")]))
    (d / "d.html").write_text(
        "<html><body><h1>H</h1><p>html body</p></body></html>")
    (d / "e.txt").write_text("plain paragraph one\n\nplain paragraph two")

    rows = {r["doc_id"].rsplit("/", 1)[-1]: r
            for r in extract_files(spark, str(d), parallelism=2).collect()}
    assert set(rows) == {"a.pdf", "b.docx", "c.rtf", "d.html", "e.txt"}
    assert [s["text"] for s in rows["a.pdf"]["spans"]] == ["pdf text here"]
    assert [(s["kind"], s["text"]) for s in rows["b.docx"]["spans"]] == [
        ("header", "DocB"), ("text", "docx body")]
    assert [s["text"] for s in rows["c.rtf"]["spans"]] == ["rtf body"]
    assert [(s["kind"], s["text"]) for s in rows["d.html"]["spans"]] == [
        ("header", "H"), ("text", "html body")]
    assert [s["text"] for s in rows["e.txt"]["spans"]] == [
        "plain paragraph one", "plain paragraph two"]
    assert all(r["error"] is None for r in rows.values())


def test_extract_files_binary_blobs_become_error_spans(spark, tmp_path):
    """Unextractable binary payloads (media magics, NUL-bearing bytes,
    plain zip archives) must yield AUDITABLE error spans, never silent
    ISO-8859-1 mojibake text (r4 advisor finding) — while latin-1 TEXT
    (no NULs, not valid utf-8) still rides the force_decode ladder."""
    import zipfile

    from pydoxtools_spark.pipeline import extract_files

    d = tmp_path / "bincorpus"
    d.mkdir()
    (d / "img.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    (d / "photo.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x12" * 64)
    (d / "blob.bin").write_bytes(bytes(range(256)) * 4)  # NULs, not utf8
    with zipfile.ZipFile(d / "archive.zip", "w") as z:
        z.writestr("readme.txt", "inner file")  # PK magic, no container
    (d / "latin.txt").write_bytes("caf\xe9 cr\xe8me".encode("latin-1"))

    rows = {r["doc_id"].rsplit("/", 1)[-1]: r
            for r in extract_files(spark, str(d), parallelism=2).collect()}
    assert set(rows) == {"img.png", "photo.jpg", "blob.bin",
                         "archive.zip", "latin.txt"}
    for name in ("img.png", "photo.jpg", "blob.bin", "archive.zip"):
        # error spans surface as the error COLUMN (spans stay empty)
        assert rows[name]["spans"] == [], name
        assert "binary" in rows[name]["error"], (name, rows[name]["error"])
    assert [s["text"] for s in rows["latin.txt"]["spans"]] == [
        "caf\xe9 cr\xe8me"]


def test_docx_embedded_media_to_features(spark):
    """docx embedded images: the bytes behind an image span's
    media_ref surface as media rows (container_media_blobs) and decode
    through media_features like any other blob — closing the r4
    verdict's docx-image gap.  Corrupt zips are contained error rows;
    the image SPAN's media_ref (rels target) joins its media row via
    ref + target."""
    import numpy as np

    from pydoxtools_spark.functions.docx import build_tiny_docx
    from pydoxtools_spark.functions.media import build_bmp
    from pydoxtools_spark.operators.multimodal import media_features
    from pydoxtools_spark.pipeline import container_media_blobs

    px = np.full((4, 6, 3), 120, dtype=np.uint8)
    docx = build_tiny_docx([
        ("header", "T", 1),
        ("image", "media/image1.bmp", build_bmp(px)),
        ("text", "body"),
    ])
    blobs = spark.createDataFrame(
        [("b://1", bytearray(docx)), ("b://bad", bytearray(b"PK\x03\x04junk"))],
        "ref string, content binary")
    media = container_media_blobs(blobs)
    rows = media.collect()
    good = [r for r in rows if r["error"] is None]
    assert [(r["ref"], r["target"], r["media_ref"]) for r in good] == [
        ("b://1", "media/image1.bmp", "b://1#media/image1.bmp")]
    assert [r["ref"] for r in rows if r["error"] is not None] == ["b://bad"]

    feats = media_features(
        media.filter("error IS NULL").select(
            "media_ref", "media_type", "content",
            F.lit(None).cast("map<string,string>").alias("meta"))
    ).collect()
    assert [(f["width"], f["height"], f["decode_error"]) for f in feats] == [
        (6, 4, None)]


def test_rtf_embedded_media_to_features(spark):
    """rtf \\pict payloads flow the same container-media path as docx
    (r5 verdict item 6, the last container-media gap): image span with
    positional pict{n} media_ref, bytes through container_media_blobs
    (content-probed, same blob frame as the zip containers), real
    decode via media_features.  Word's dual shppict/nonshppict
    emission yields exactly one image; bad hex keeps the span and
    drops the bytes."""
    import numpy as np

    from pydoxtools_spark.functions.media import build_bmp
    from pydoxtools_spark.functions.rtf import (
        build_tiny_rtf,
        extract_rtf_media,
        extract_rtf_spans,
    )
    from pydoxtools_spark.operators.multimodal import media_features
    from pydoxtools_spark.pipeline import container_media_blobs

    px = np.full((3, 5, 3), 90, dtype=np.uint8)
    rtf = build_tiny_rtf([
        ("header", "T", 1),
        ("image", "ignored-target", build_bmp(px)),
        ("text", "body"),
    ])
    assert [(k, r) for k, _, r in extract_rtf_spans(rtf)] == [
        ("header", None), ("image", "pict1"), ("text", None)]

    blobs = spark.createDataFrame(
        [("b://r", bytearray(rtf))], "ref string, content binary")
    media = container_media_blobs(blobs).collect()
    assert [(m["ref"], m["target"], m["media_ref"], m["error"])
            for m in media] == [("b://r", "pict1", "b://r#pict1", None)]
    feats = media_features(
        container_media_blobs(blobs).filter("error IS NULL").select(
            "media_ref", "media_type", "content",
            F.lit(None).cast("map<string,string>").alias("meta"))
    ).collect()
    assert [(f["width"], f["height"], f["decode_error"])
            for f in feats] == [(5, 3, None)]

    # Word dual emission: \*\shppict copy skipped, nonshppict parsed
    raw = (rb"{\rtf1\ansi{\pard t\par}"
           rb"{\*\shppict{\pict\pngblip AA}}"
           rb"{\nonshppict{\pict\pngblip FF}}\par}")
    assert [(k, r) for k, _, r in extract_rtf_spans(raw)] == [
        ("text", None), ("image", "pict1")]
    assert extract_rtf_media(raw) == [("pict1", b"\xff")]
    bad = rb"{\rtf1{\pard{\pict\pngblip ZZZ}\par}}"
    assert [k for k, _, _ in extract_rtf_spans(bad)] == ["image"]
    assert extract_rtf_media(bad) == []


def test_docx_page_headers_footers():
    """Page furniture (word/headerN.xml / footerN.xml, sectPr-
    referenced): extracted as (part, text) pairs with the body's
    whitespace canonicalization, kept out of the body span stream (the
    page_template analogue on the container side); broken furniture
    parts never kill the doc."""
    import zipfile as _zf
    import io as _io

    from pydoxtools_spark.functions.docx import (
        extract_docx_headers_footers, extract_docx_spans)

    d = build_tiny_docx(BLOCKS, header_text="ACME  Quarterly",
                        footer_text="page 1 of 99")
    assert extract_docx_spans(d) == extract_docx_spans(
        build_tiny_docx(BLOCKS))  # body spans unchanged
    assert extract_docx_headers_footers(d) == [
        ("footer", "page 1 of 99"), ("header", "ACME Quarterly")]
    assert b"headerReference" in d and b"footerReference" in d
    # a corrupt header part is skipped, not fatal
    buf = _io.BytesIO()
    with _zf.ZipFile(_io.BytesIO(d)) as zin, \
            _zf.ZipFile(buf, "w") as zout:
        for n in zin.namelist():
            zout.writestr(n, b"<broken" if n == "word/header1.xml"
                          else zin.read(n))
    assert extract_docx_headers_footers(buf.getvalue()) == [
        ("footer", "page 1 of 99")]


def test_odt_embedded_media_extraction():
    """odt parity for embedded media: Pictures/ payloads written by
    build_tiny_odt surface through the same extract_container_media /
    media pipeline the docx side uses."""
    import numpy as np

    from pydoxtools_spark.functions.docx import extract_container_media
    from pydoxtools_spark.functions.media import build_bmp, parse_bmp
    from pydoxtools_spark.functions.odf import build_tiny_odt

    px = np.full((5, 7, 3), 80, dtype=np.uint8)
    odt = build_tiny_odt([("text", "hello"),
                          ("image", "Pictures/img1.bmp", build_bmp(px))])
    media = extract_container_media(odt)
    assert [t for t, _b in media] == ["Pictures/img1.bmp"]
    w, h, back = parse_bmp(media[0][1])
    assert (w, h) == (7, 5) and (back == px).all()


def test_rtf_pict_nested_destination_hex_not_captured():
    """r6 advisor finding: {\\*\\blipuid <hex>} nested inside \\pict is
    valid hex — it must NOT prepend to the decoded payload (capture
    happens only at the pict group's own depth)."""
    from pydoxtools_spark.functions.rtf import extract_rtf_media

    rtf = (rb"{\rtf1 {\pict{\*\blipuid 00112233445566778899aabbccddeeff}"
           rb"\pngblip\picw4\pich3 DEADBEEF}\par}")
    assert extract_rtf_media(rtf) == [("pict1", b"\xde\xad\xbe\xef")]
