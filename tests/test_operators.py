"""Operator-level tests: reference-derived invariants (FIXTURES.md §7)
plus the training-data ops (dedup/similarity/multimodal/templates)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pydoxtools_spark.constants import PARAGRAPH_JOIN
from pydoxtools_spark.fixtures import gen_corpus, gen_doc
from pydoxtools_spark.operators import bag, dedup, multimodal, similarity, templates
from pydoxtools_spark.operators.textstats import text_pieces
from pydoxtools_spark.pipeline import extract
from pydoxtools_spark.schemas import DOCUMENTS_IN, PDF_ELEMENT


# ------------------------- reference invariants (test_extractor.py ports)


def test_five_paragraph_text_yields_five_spans(spark):
    """Analogue of elements shape (5, 26) for a 5-paragraph text doc
    (reference tests/test_extractor.py:147)."""
    text = PARAGRAPH_JOIN.join(f"paragraph number {i}" for i in range(5))
    df = spark.createDataFrame(
        [{"doc_id": "t5", "spans": [
            {"kind": "text", "text": text, "media_ref": None, "offset": 0}]}],
        schema=DOCUMENTS_IN)
    out = extract(spark, df, None, parallelism=2).collect()[0]
    assert [s["text"] for s in out["spans"]] == [
        f"paragraph number {i}" for i in range(5)]


@pytest.fixture(scope="module")
def pdf_doc(spark):
    """A doc with a multi-page pdf payload."""
    for i in range(200):
        doc, pdf_rows, exp = gen_doc(i)
        pages = {r["p_num"] for r in pdf_rows}
        if len(pages) >= 2 and len(doc["spans"]) == 1:
            docs_df = spark.createDataFrame([doc], schema=DOCUMENTS_IN)
            pdf_df = spark.createDataFrame(pdf_rows, schema=PDF_ELEMENT)
            return docs_df, pdf_df, exp, sorted(pages)
    pytest.skip("no multi-page single-pdf doc in first 200")


def test_page_filtering(spark, pdf_doc):
    """page_numbers=[p] restricts spans to that page (reference
    tests/test_extractor.py:589-605 analogue)."""
    docs_df, pdf_df, exp, pages = pdf_doc
    full = extract(spark, docs_df, pdf_df, parallelism=2).collect()[0]
    only_p0 = extract(spark, docs_df, pdf_df, parallelism=2,
                      page_numbers=[pages[0]]).collect()[0]
    assert 0 < len(only_p0["spans"]) < len(full["spans"])
    max1 = extract(spark, docs_df, pdf_df, parallelism=2,
                   max_pages=1).collect()[0]
    assert [s["text"] for s in max1["spans"]] == [
        s["text"] for s in only_p0["spans"]]


def test_span_template_placeholders(spark):
    """{Table_k}/{Image_k} placeholders for excluded kinds (reference
    tests/test_extractor.py:668-674 analogue)."""
    rows = [{"doc_id": "d", "spans": [
        {"kind": "text", "text": "hello", "media_ref": None, "offset": 0},
        {"kind": "table", "text": "a | b", "media_ref": None, "offset": 5},
        {"kind": "image", "text": None, "media_ref": "media://img/1", "offset": 10},
    ]}]
    df = spark.createDataFrame(rows, schema=DOCUMENTS_IN)
    out = templates.span_template(df).collect()[0]["template"]
    assert out == "hello\n\n{Table_1}\n\n{Image_2}"


def test_dispatch_same_payload_same_route(spark):
    """Same content delivered in two docs routes identically
    (reference tests/test_extractor.py:62-97 analogue)."""
    from pydoxtools_spark.dispatch import doc_type_col
    df = spark.createDataFrame(
        [("a", "<html><body><p>x</p></body></html>"),
         ("b", "<html><body><p>x</p></body></html>"),
         ("c", '{"k": 1}'), ("d", "plain words only")],
        ["id", "content"])
    got = {r["id"]: r["t"] for r in df.select(
        "id", doc_type_col(F.col("content")).alias("t")).collect()}
    assert got["a"] == got["b"] == "text/html"
    assert got["c"] == "application/json"
    assert got["d"] == "text/plain"


# ----------------------------------------------------- training-data ops


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"])
    rows = {r["content_hash"]: r for r in dedup.exact_dedup(df).collect()}
    assert len(rows) == 2
    by_count = sorted(rows.values(), key=lambda r: -r["dup_count"])
    assert by_count[0]["doc_id"] == 1 and by_count[0]["dup_count"] == 2


def test_minhash_identical_docs_full_match(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different content here entirely")],
        ["doc_id", "text"])
    pairs = dedup.minhash_dedup_pairs(df, threshold=0.9, num_perm=16,
                                      bands=4).collect()
    assert len(pairs) == 1
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2)
    assert pairs[0]["est_jaccard"] == 1.0


def test_simhash_near_duplicates_close(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta iota"),
         (3, "nothing in common with any other writing sample")],
        ["doc_id", "text"])
    sigs = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", dedup.simhash(F.col("text"), bits=64).alias("s")).collect()}
    ham12 = sum(a != b for a, b in zip(sigs[1], sigs[2]))
    ham13 = sum(a != b for a, b in zip(sigs[1], sigs[3]))
    assert len(sigs[1]) == 64
    assert ham12 < ham13


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z y x w v")],
        ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(df, k=3, threshold=0.5,
                                      max_df=100).collect()
    assert len(pairs) == 1 and pairs[0]["jaccard"] == 1.0


def test_brute_force_topk_finds_clone(spark):
    rows = [(i, [float(i == j) for j in range(8)]) for i in range(8)]
    rows.append((100, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))  # clone of 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0)
    top = similarity.brute_force_topk(df, q, k=1).collect()
    assert top[0]["neighbor_id"] == 100
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9


def test_lsh_topk_bucket_recall(spark):
    rows = [(i, [float((i >> j) & 1) * 2 - 1 for j in range(8)]) for i in range(20)]
    rows.append((100, rows[5][1]))  # exact clone of vec 5
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 5)
    top = similarity.lsh_topk(df, q, k=1, n_planes=4, dim=8).collect()
    # clone shares every LSH bucket -> must be found with cos ~ 1
    assert top and top[0]["neighbor_id"] == 100


def test_media_codec_roundtrip():
    import numpy as np

    from pydoxtools_spark.functions.media import (
        bmp_size, build_bmp, build_wav, parse_bmp, parse_wav)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    data = build_bmp(px)
    assert len(data) == bmp_size(7, 6)
    w, h, back = parse_bmp(data)
    assert (w, h) == (7, 6) and (back == px).all()

    samples = rng.integers(-32768, 32767, size=123, dtype=np.int16)
    rate, back_s = parse_wav(build_wav(samples, 8000))
    assert rate == 8000 and (back_s == samples).all()


def test_media_features_real_codecs(spark):
    import numpy as np

    from pydoxtools_spark.functions.media import bmp_size, build_bmp, build_wav

    px = np.zeros((4, 5, 3), dtype=np.uint8)
    px[:, :] = (200, 100, 50)  # solid color -> one-hot luminance hist
    rows = [
        {"media_ref": "m1", "media_type": "image",
         "content": build_bmp(px), "meta": None},
        {"media_ref": "a1", "media_type": "audio",
         "content": build_wav(np.full(800, 1024, dtype=np.int16), 8000),
         "meta": None},
        {"media_ref": "v1", "media_type": "video", "content": b"fakemp4",
         "meta": {"n_frames": "90"}},
        {"media_ref": "m2", "media_type": "image", "content": None,
         "meta": None},
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA)
    out = {r["media_ref"]: r for r in multimodal.media_features(df).collect()}

    lum = (299 * 200 + 587 * 100 + 114 * 50) // 1000
    m1 = out["m1"]
    assert (m1["width"], m1["height"]) == (5, 4)
    assert m1["n_bytes"] == bmp_size(5, 4)
    assert m1["mean_level"] == lum and m1["feature"][lum >> 4] == 1.0
    a1 = out["a1"]
    assert (a1["sample_rate"], a1["duration_ms"]) == (8000, 100)
    assert a1["mean_level"] == 1024 and a1["feature"][0] == 1.0
    # undecodable codecs + empty payloads -> contained error rows
    assert out["v1"]["decode_error"] and out["v1"]["width"] is None
    assert out["m2"]["decode_error"]
    frames = multimodal.frame_sample_plan(df, every_n=30).collect()
    assert sorted(r["frame_idx"] for r in frames if r["media_ref"] == "v1") == [0, 30, 60]


def test_ocr_mock_model_plug_point(spark):
    """The batched OCR plug point (reference extract_ocr.py:21-52): a
    mock model with the production batch signature (list of decoded
    images -> list of texts) recovers text from the deterministic
    raster pair; undecodable rows are contained, the model still sees
    one clean batch."""
    from pydoxtools_spark.functions.media import (
        build_text_bmp, read_text_bmp_pixels)

    calls = []

    def mock_model(images):
        calls.append(len(images))
        return [read_text_bmp_pixels(im) for im in images]

    rows = [
        {"media_ref": "t1", "media_type": "image",
         "content": build_text_bmp("hello ocr"), "meta": None},
        {"media_ref": "t2", "media_type": "image",
         "content": build_text_bmp("zweite Zeile"), "meta": None},
        {"media_ref": "bad", "media_type": "image", "content": b"not-bmp",
         "meta": None},
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA).coalesce(1)
    out = {r["media_ref"]: r for r in
           multimodal.ocr_extract(df, mock_model).collect()}
    assert out["t1"]["text"] == "hello ocr"
    assert out["t2"]["text"] == "zweite Zeile"
    assert out["bad"]["text"] is None and out["bad"]["error"]


def test_text_pieces_bounded_and_ordered(spark):
    text = " ".join(f"word{i:03d}" for i in range(300))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    pieces = sorted(text_pieces(df).collect(), key=lambda r: r["piece"])
    assert all(len(p["piece_text"]) <= 512 for p in pieces)
    assert " ".join(p["piece_text"] for p in pieces) == text


def test_bag_ops(spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, [30])], ["doc_id", "xs"])
    ex = bag.exploded(df, "xs").collect()
    assert len(ex) == 3
    st = bag.bag_stats(df.select("doc_id"), "doc_id").collect()[0]
    assert st["n_docs"] == 2 and st["sum_doc_id"] == 3


def test_jsonld_extraction(spark):
    from pydoxtools_spark.functions.htmlparse import extract_jsonld
    html = ('<html><head><script type="application/ld+json">'
            '{"@type": "Article", "name": "x"}</script>'
            '<script type="application/ld+json">not json</script>'
            '<script>var x = 1;</script></head><body><p>t</p></body></html>')
    out = extract_jsonld(html)
    assert len(out) == 1 and '"@type"' in out[0]


def test_connected_components_and_canonical_dedup(spark):
    # two chains: 1-2-3 and 7-8; singleton 9 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"])
    comp = {r["id"]: r["component"]
            for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 7, 8, 9)], ["doc_id", "text"])
    kept = sorted(r["doc_id"]
                  for r in dedup.dedup_keep_canonical(docs, pairs).collect())
    assert kept == [1, 7, 9]


def test_knn_graph_lsh_no_corpus_broadcast(spark):
    """The LSH KNN graph must never cross-join or broadcast-nested-loop
    the corpus (the scale-killer the brute-force form has by design)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(60)]
    rows += [(1000 + i, rows[i][1]) for i in range(10)]  # exact clones
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])

    g = similarity.knn_graph_lsh(e, k=2, max_dist=0.1, n_planes=8, rotations=3)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # exact clones share every bucket -> recall 1 at dist ~0
    edges = {(r["src"], r["dst"]) for r in g.collect()}
    for i in range(10):
        assert (1000 + i, i) in edges


def test_connected_components_checkpoint_dir(spark, tmp_path):
    """Reliable-checkpoint form converges identically."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"])
    comp = {r["id"]: r["component"]
            for r in dedup.connected_components(
                pairs, checkpoint_dir=str(tmp_path / "ckpt")).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_extract_schema_microdata_opengraph():
    from pydoxtools_spark.functions.htmlparse import extract_schema

    html = (
        '<html><head>'
        '<meta property="og:title" content="OG Title">'
        '<meta property="og:image" content="https://x/img.png">'
        '<script type="application/ld+json">{"@type": "Article"}</script>'
        '</head><body>'
        '<div itemscope itemtype="https://schema.org/Person">'
        '  <span itemprop="name">Jane Doe</span>'
        '  <img itemprop="photo" src="/jane.jpg">'
        '  <a itemprop="url" href="https://jane.example">home</a>'
        '  <time itemprop="birthDate" datetime="1990-01-01">Jan 1</time>'
        '</div></body></html>'
    )
    out = extract_schema(html)
    assert out["opengraph"] == {"og:title": "OG Title",
                                "og:image": "https://x/img.png"}
    assert len(out["json-ld"]) == 1
    (item,) = out["microdata"]
    assert item["type"] == "https://schema.org/Person"
    assert item["properties"] == {
        "name": "Jane Doe", "photo": "/jane.jpg",
        "url": "https://jane.example", "birthDate": "1990-01-01"}


def test_embedding_neardup_rotations_recall(spark):
    """At moderate thresholds a single 8-bit table misses near (not
    identical) pairs; rotations recover them without re-verification."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = [rng.normal(size=32) for _ in range(40)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # near-dups: small perturbation (cos ~0.99 but sign flips likely
    # on some plane among 8 bits)
    rows += [(1000 + i, [float(x) for x in v + rng.normal(scale=0.08, size=32)])
             for i, v in enumerate(base)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def recall(rot):
        got = similarity.embedding_neardup_pairs(
            e, threshold=0.95, n_planes=8, dim=32, rotations=rot)
        pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
        return sum((i, 1000 + i) in pairs for i in range(40))

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1 and r4 >= 35  # rotations strictly help, high recall


def test_curation_scrub_and_split(spark):
    from pydoxtools_spark.operators import curation

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.co.uk, ip 192.168.0.1, tel +44 20 7946 0958 ok"),
         (2, "no pii here"), (3, "v1.2.3.4.5 is a version")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", curation.scrub_pii(F.col("text")).alias("c")).collect()}
    assert got[1] == "mail <EMAIL>, ip <IP>, tel <PHONE> ok"
    assert got[2] == "no pii here"

    # split: deterministic across repartitionings, proportions sane
    ids = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in
          curation.deterministic_split(ids, val_pct=10, test_pct=5).collect()}
    s2 = {r["doc_id"]: r["split"] for r in
          curation.deterministic_split(ids.repartition(13),
                                       val_pct=10, test_pct=5).collect()}
    assert s1 == s2
    n = len(s1)
    frac_val = sum(v == "val" for v in s1.values()) / n
    frac_test = sum(v == "test" for v in s1.values()) / n
    assert 0.07 < frac_val < 0.13 and 0.03 < frac_test < 0.07


def test_hash_embeddings_neardup_chain(spark):
    """text -> feature-hash embeddings -> LSH near-dup: exact duplicate
    docs land at cosine 1.0 with recall 1 (identical vectors share
    every bucket)."""
    base = [(i, f"some document body {i} with shared words and tail{i}")
            for i in range(30)]
    clones = [(100 + i, t) for i, t in base[:10]]
    df = spark.createDataFrame(base + clones, ["doc_id", "text"])
    emb = similarity.hash_embeddings(df, dim=64)
    # dense vectors are unit-norm
    import math
    v0 = emb.filter(F.col("doc_id") == 0).collect()[0]["embedding"]
    assert math.isclose(sum(x * x for x in v0), 1.0, rel_tol=1e-9)
    pairs = similarity.embedding_neardup_pairs(
        emb, threshold=0.9999, id_col="doc_id", dim=64)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, 100 + i) for i in range(10)} <= got


def test_classify_address_and_profiles(spark):
    from pydoxtools_spark.operators import classify

    df = spark.createDataFrame(
        [(1, "Acme GmbH, 42 Market Street, 10117 Berlin"),
         (2, "just a paragraph about engines"),
         (3, "call me at 12345"),            # zip-like only: 1 feature
         (4, "12 Elm Road")],                # house number + street: 2
        ["doc_id", "text"])
    got = {r["doc_id"]: r["a"] for r in df.select(
        "doc_id", classify.is_address(F.col("text")).alias("a")).collect()}
    assert got == {1: True, 2: False, 3: False, 4: True}

    prof = {"fruit": ["apple", "pear"], "metal": ["iron", "zinc"]}
    lab = {r["doc_id"]: r["l"] for r in df.select(
        "doc_id",
        classify.classify_profile(
            F.concat(F.col("text"), F.when(F.col("doc_id") == 2,
                                           " apple apple iron")
                     .otherwise(F.lit(""))), prof).alias("l")).collect()}
    assert lab[2] == "fruit" and lab[1] == "other"


# ------------------------------------------------- pagerank / textrank


def _ref_pagerank(edges, d=0.85, iters=10, nodes=None):
    """Driver-side reference: same fixed-iteration weighted pagerank
    with uniform dangling redistribution (networkx semantics)."""
    if nodes is None:
        nodes = sorted({i for i, _j, _w in edges} | {j for _i, j, _w in edges})
    n = len(nodes)
    outw = {}
    for i, _j, w in edges:
        outw[i] = outw.get(i, 0.0) + w
    r = {i: 1.0 / n for i in nodes}
    for _ in range(iters):
        dm = sum(r[i] for i in nodes if i not in outw)
        nxt = {j: (1 - d) / n + d * dm / n for j in nodes}
        for i, j, w in edges:
            nxt[j] += d * r[i] * w / outw[i]
        r = nxt
    return r


def test_pagerank_matches_reference_including_dangling(spark):
    # node 3 is dangling (incoming only); weighted asymmetric graph
    edges = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0), (1, 3, 3.0)]
    df = spark.createDataFrame(
        [("d", s, t, w) for s, t, w in edges],
        ["doc_id", "src", "dst", "weight"])
    got = {r["id"]: r["rank"] for r in similarity.pagerank(
        df, iters=10).collect()}
    want = _ref_pagerank(edges, iters=10)
    assert got.keys() == want.keys()
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, i
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_textrank_keywords_chain(spark):
    """Full chain equivalence: token embeddings -> per-doc knn edges ->
    weighted pagerank -> deduped top-k labels, checked against a
    driver-side numpy/python reference of the identical chain (two
    docs, duplicate labels, asymmetric similarity structure)."""
    import numpy as np

    rng = np.random.default_rng(3)
    k, max_dist, iters, top_k = 3, 0.6, 8, 4
    rows, want = [], {}
    for doc in ("d1", "d2"):
        n = 7
        labels = [f"w{(i * 3 + (doc == 'd2')) % 5}" for i in range(n)]
        vecs = rng.normal(size=(n, 16))
        vecs[3] = vecs[0] * 0.7 + vecs[1] * 0.3  # asymmetric hub structure
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for t in range(n):
            rows.append((doc, t, labels[t], [float(x) for x in vecs[t]]))
        # ---- reference chain
        cos = vecs @ vecs.T
        edges = []
        for i in range(n):
            order = sorted((j for j in range(n) if j != i),
                           key=lambda j: (-cos[i, j], j))
            for j in order[:k]:
                if 1.0 - cos[i, j] <= max_dist:
                    edges.append((i, j, cos[i, j]))
        r = _ref_pagerank(edges, iters=iters, nodes=list(range(n)))
        ranked = sorted(r, key=lambda i: (-round(r[i], 6), i))
        seen, kws = set(), []
        for i in ranked:
            if labels[i] not in seen:
                seen.add(labels[i])
                kws.append(labels[i])
        want[doc] = kws[:top_k]

    df = spark.createDataFrame(rows, ["doc_id", "tok_id", "token", "embedding"])
    out = similarity.textrank_keywords(
        df, top_k=top_k, k=k, max_dist=max_dist, iters=iters).collect()
    got = {}
    for row in sorted(out, key=lambda rr: (rr["doc_id"], rr["pos"])):
        got.setdefault(row["doc_id"], []).append(row["keyword"])
    assert got == want


def test_knn_graph_size_gate_routes_to_lsh(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(30)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # clones
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])

    gated = similarity.knn_graph(e, k=2, max_dist=0.1, exact_max=10, dim=16)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # corpus never broadcast
    lsh = similarity.knn_graph_lsh(e, k=2, max_dist=0.1, dim=16)
    assert sorted(map(tuple, gated.collect())) == sorted(map(tuple, lsh.collect()))


def test_knn_graph_auto_route_spends_no_job(spark):
    """Routing with exact=None must not run a Spark job (r5 verdict
    item 7: the count() at similarity.py:240 was the package's last
    eager action): plan construction under a fresh job group leaves the
    group with zero job ids, for both the stats path and size_hint."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])

    sc = spark.sparkContext
    sc.setJobGroup("knn-route-probe", "must stay empty")
    try:
        g1 = similarity.knn_graph(e, k=2, dim=16)
        g2 = similarity.knn_graph(e, k=2, dim=16, size_hint=20)
        g3 = similarity.knn_graph(e, k=2, dim=16, size_hint=10**7)
        assert sc.statusTracker().getJobIdsForGroup("knn-route-probe") == []
    finally:
        sc.cancelJobGroup("knn-route-probe")
    # hinted routes are pinned: small hint -> exact plan shape, huge
    # hint -> LSH (no corpus broadcast)
    p3 = g3._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p3
    assert sorted(map(tuple, g1.collect())) == sorted(map(tuple, g2.collect()))


def test_minhash_storage_path_written_table(spark, tmp_path):
    """storage_path materializes signatures as a written parquet table:
    the band/verify plan must READ from it (executor-loss-safe form)
    and produce the same pairs as the localCheckpoint default."""
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different content here entirely")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    p = str(tmp_path / "sigs.parquet")
    stored = dedup.minhash_dedup_pairs(
        df, threshold=0.9, num_perm=16, bands=4, storage_path=p)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    # the band/verify stages scan the written signatures table (the
    # plan string elides long paths, so assert on the parquet scan)
    assert "ReadSchema: struct<id:bigint,sig:array<bigint>>" in plan
    default = dedup.minhash_dedup_pairs(df, threshold=0.9, num_perm=16, bands=4)
    assert sorted(map(tuple, stored.collect())) == \
        sorted(map(tuple, default.collect()))


def test_model_plug_points_batched_contract(spark):
    """Mock deterministic linear-head models dropped into the
    classify/embed HF slots (operators/modelplug.py): batching (one
    model call per Arrow batch), schema, determinism, and containment
    (a raising model poisons only its batch, and its rows carry the
    error)."""
    import numpy as np

    from pydoxtools_spark.operators import modelplug

    W = np.arange(24, dtype=float).reshape(3, 8) % 5 - 2  # frozen head
    classes = ["a", "b", "c"]

    def feats(texts):
        return np.array(
            [[(len(t) * (j + 3)) % 7 - 3 for j in range(8)] for t in texts],
            dtype=float)

    def linear_classifier(texts):
        return [classes[int(np.argmax(W @ f))] for f in feats(texts)]

    def linear_embedder(texts):
        return [list(W.T @ w) for w in (W @ feats(texts).T).T]

    rows = [(str(i), f"text number {i} " + "x" * (i % 11)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(2)

    got = {r["id"]: r for r in
           modelplug.classify_with_model(df, linear_classifier).collect()}
    assert len(got) == 40 and all(r["error"] is None for r in got.values())
    # deterministic: same label as a driver-side call
    for i in (0, 7, 23):
        assert got[str(i)]["label"] == linear_classifier([rows[i][1]])[-1]

    # batched, not per-row: a probe model labels each row with the size
    # of the model call it arrived in — every row must report > 1
    def batch_probe(texts):
        return [f"batch{len(texts)}"] * len(texts)

    probes = modelplug.classify_with_model(df, batch_probe).collect()
    assert all(int(r["label"][5:]) > 1 for r in probes)
    assert sum(int(r["label"][5:]) for r in probes) >= 40

    emb = {r["id"]: r for r in
           modelplug.embed_with_model(df, linear_embedder).collect()}
    assert all(len(r["embedding"]) == 8 and r["error"] is None
               for r in emb.values())
    # embeddings feed the existing ANN ops unchanged
    e = modelplug.embed_with_model(df, linear_embedder).select(
        F.col("id").alias("vec_id"), "embedding")
    g = similarity.knn_graph_lsh(e, k=2, max_dist=0.05, dim=8, n_planes=4)
    assert g.count() >= 0

    def broken_model(texts):
        raise RuntimeError("cuda out of memory")

    bad = modelplug.classify_with_model(df, broken_model).collect()
    assert all(r["label"] is None and "cuda out of memory" in r["error"]
               for r in bad)

    def wrong_count_model(texts):
        return ["a"]  # violates the len contract

    short = modelplug.classify_with_model(df, wrong_count_model).collect()
    assert all("model returned" in r["error"] for r in short)


def test_drop_repeated_lines_keep_first_preserve_blanks(spark):
    from pydoxtools_spark.operators import curation

    text = "alpha\nbeta\nalpha\n\ngamma\n\nbeta\ndelta"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    (row,) = curation.drop_repeated_lines(df).collect()
    assert row["clean_text"] == "alpha\nbeta\n\ngamma\n\ndelta"


def test_drop_boilerplate_lines_cross_doc(spark):
    from pydoxtools_spark.operators import curation

    rows = [(i, f"COOKIE NOTICE\ncontent {i}\nfooter") for i in range(6)]
    rows.append((99, "COOKIE NOTICE\nrare line\nsolo 99"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["clean_text"] for r in
           curation.drop_boilerplate_lines(df, min_df=5).collect()}
    # COOKIE NOTICE (df=7) and footer (df=6) cross the cap; per-doc
    # content survives
    assert out[0] == "content 0"
    assert out[99] == "rare line\nsolo 99"


def test_decontaminate_flags_embedded_benchmark(spark):
    bench_text = "what is the capital of france it is paris of course"
    docs = [
        (1, "some intro words then " + bench_text + " and trailing words"),
        (2, "completely unrelated content with many different words here"),
        (3, bench_text),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    bench = spark.createDataFrame([(100, bench_text)], ["bench_id", "text"])
    out = dedup.decontaminate(df, bench, k=5, threshold=0.8)
    flagged = {(r["doc_id"], r["bench_id"]): r["overlap"] for r in out.collect()}
    assert (1, 100) in flagged and flagged[(1, 100)] == 1.0
    assert (3, 100) in flagged
    assert (2, 100) not in flagged


def test_textrank_sentences_extractive_summary(spark):
    """Extractive summary: returns <= top_k original sentences in
    document order; repeated-topic sentences (mutually similar under
    the hash embedding) outrank the lone off-topic one."""
    topic = "spark shuffle partition skew broadcast join plan"
    docs = [("d1",
             f"{topic} alpha. {topic} beta. nothing shared here at all. "
             f"{topic} gamma. {topic} delta.")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = sorted(similarity.textrank_sentences(df, top_k=3, k=3).collect(),
                 key=lambda r: r["pos"])
    sents = [r["sentence"] for r in out]
    assert 0 < len(sents) <= 3
    # document order preserved
    text = docs[0][1]
    assert [text.find(s) for s in sents] == sorted(text.find(s) for s in sents)
    # the central (topic) sentences win over the off-topic one
    assert all(topic in s for s in sents)
    # deterministic
    again = sorted(similarity.textrank_sentences(df, top_k=3, k=3).collect(),
                   key=lambda r: r["pos"])
    assert [r["sentence"] for r in again] == sents


def test_entities_grouped_form(spark):
    from pydoxtools_spark.operators.entities import entities_grouped

    text = ("Alice Smith met Bob Jones on 2023-05-01; mail "
            "a@b.co or see https://x.org/a costing $5.00 and $5.00")
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = {r["label"]: r["entities"] for r in entities_grouped(df).collect()}
    assert got["NAME"] == ["Alice Smith", "Bob Jones"]
    assert got["DATE"] == ["2023-05-01"]
    assert got["EMAIL"] == ["a@b.co"]
    assert got["URL"] == ["https://x.org/a"]
    assert got["MONEY"] == ["$5.00"]  # distinct


def test_repetition_signals_extremes(spark):
    from pydoxtools_spark.operators import curation

    rows = [
        (1, "a b c d e f g h i j"),            # all unique: every frac 0
        (2, "x y\nx y\nx y"),                   # 3 identical lines
        (3, ""),                                # degenerate: all 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           curation.repetition_signals(df).collect()}
    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["dup_ngram_frac"] == 0.0
    assert out[1]["top_ngram_frac"] == pytest.approx(1 / 9)  # 9 2-grams tie
    # doc 2: 3 lines, 1 distinct -> 2/3 dup; whole stream is "x y x y
    # x y" -> every 5-gram (2 of them) unique? no: grams "x y x y x"
    # and "y x y x y" are distinct singletons -> dup_ngram 0; 2-grams:
    # "x y" x3 (len 3), "y x" x2 (len 3) -> top = 9/15
    assert out[2]["dup_line_frac"] == pytest.approx(2 / 3)
    assert out[2]["dup_line_char_frac"] == pytest.approx(2 / 3)
    assert out[2]["top_ngram_frac"] == pytest.approx(9 / 15)
    assert out[2]["dup_ngram_frac"] == 0.0
    assert tuple(out[3])[1:] == (0.0, 0.0, 0.0, 0.0)


def test_duplicated_window_spans_merges_adjacent_runs(spark):
    from pydoxtools_spark.operators import dedup

    shared = " ".join(f"w{i}" for i in range(12))  # 12-word shared run
    rows = [
        (1, "pre1 " + shared + " post1"),
        (2, "different opening words here " + shared),
        (3, "no overlap with anything at all whatsoever honestly"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["doc_id"]): (r["start_word"], r["end_word"]) for r in
           dedup.duplicated_window_spans(df, n=8, min_docs=2).collect()}
    # doc1: shared occupies words 2..13 -> five 8-windows (s=2..6) merge
    # into ONE maximal interval [2, 13]
    assert out[1] == (2, 13)
    assert out[2] == (5, 16)
    assert 3 not in out


def test_quota_sample_salted_two_level_is_exact(spark):
    from pydoxtools_spark.operators import curation

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(200)], ["doc_id", "domain"])
    plain = curation.quota_sample(df, "domain", 7)
    salted = curation.quota_sample(df, "domain", 7, salt_partitions=8)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) == 21
    # determinism under resharding
    c = sorted(map(tuple,
                   curation.quota_sample(df.repartition(13), "domain", 7)
                   .collect()))
    assert a == c


def test_unigram_logprob_known_corpus(spark):
    import math

    from pydoxtools_spark.operators import curation

    # corpus: 'a' x3, 'b' x2, 'c' x1 -> total 6
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c")], ["doc_id", "text"])
    out = {r["doc_id"]: r["logprob"] for r in
           curation.unigram_logprob(df).collect()}
    t = math.log(6.0)
    assert out[1] == pytest.approx(t - (2 * math.log(3.0) + math.log(2.0)) / 3)
    assert out[2] == pytest.approx(
        t - (math.log(3.0) + math.log(2.0) + math.log(1.0)) / 3)


def test_duplicated_windows_storage_path_written_table(spark, tmp_path):
    """storage_path materializes window hashes as a written parquet
    table: both the flag agg and the probe side read it (no recompute),
    and the intervals match the default recompute form."""
    shared = " ".join(f"w{i}" for i in range(12))
    rows = [(1, "pre1 " + shared + " post1"),
            (2, "different opening words here " + shared),
            (3, "no overlap with anything at all whatsoever honestly")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    p = str(tmp_path / "winhash.parquet")
    stored = dedup.duplicated_window_spans(
        df, n=8, min_docs=2, storage_path=p)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<id:bigint,s:int,h:string>" in plan
    default = dedup.duplicated_window_spans(df, n=8, min_docs=2)
    assert sorted(map(tuple, stored.collect())) == \
        sorted(map(tuple, default.collect()))


def test_drop_duplicated_windows_canonical_keep(spark):
    from pydoxtools_spark.operators import dedup

    shared = " ".join(f"w{i}" for i in range(12))
    rows = [(1, "pre1 " + shared + " post1"),
            (2, "different opening words here " + shared),
            (3, "no overlap with anything at all whatsoever honestly")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dedup.drop_duplicated_windows(df, n=8, min_docs=2).collect()}
    # doc 1 is canonical (min id) -> untouched
    assert out[1]["clean_text"] == "pre1 " + shared + " post1"
    assert out[1]["words_cut"] == 0
    # doc 2 loses the 12 shared words (positions 5..16)
    assert out[2]["clean_text"] == "different opening words here"
    assert out[2]["words_cut"] == 12
    # doc 3 has no duplicated runs
    assert out[3]["words_cut"] == 0
    assert out[3]["clean_text"].startswith("no overlap")


def test_sessionize_gap_boundaries(spark):
    """Strict >gap starts a new session; exactly-at-gap continues."""
    import datetime as dt

    from pydoxtools_spark.operators.events import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 10, 1.0),
        (2, t0 + dt.timedelta(minutes=30), 10, 2.0),   # == gap: same
        (3, t0 + dt.timedelta(minutes=61), 10, 3.0),   # > gap: new
        (4, t0, 20, 5.0),                              # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double")
    out = {(r["user_id"], r["session_idx"]): r for r in
           sessionize(df, gap_minutes=30).collect()}
    assert out[(10, 1)]["n_events"] == 2
    assert out[(10, 1)]["sum_value"] == 3.0
    assert out[(10, 2)]["n_events"] == 1
    assert out[(20, 1)]["n_events"] == 1


def test_line_ops_keep_null_text_docs(spark):
    """Docs with NULL text must not vanish (advisor r3): split(NULL)
    explodes to zero rows, so without the re-join both line ops would
    silently drop the doc.  Contract: every input id comes back,
    NULL text as ''."""
    from pydoxtools_spark.operators import curation

    rows = [(1, "alpha\nalpha\nbeta"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    rep = {r["doc_id"]: r["clean_text"] for r in
           curation.drop_repeated_lines(df).collect()}
    assert rep == {1: "alpha\nbeta", 2: "", 3: ""}
    boil = {r["doc_id"]: r["clean_text"] for r in
            curation.drop_boilerplate_lines(df, min_df=99).collect()}
    assert boil == {1: "alpha\nalpha\nbeta", 2: "", 3: ""}


def test_ocr_wrong_count_model_is_contained(spark):
    """A model returning the wrong number of texts must error the whole
    batch (modelplug contract), not silently null trailing rows
    (advisor r3)."""
    from pydoxtools_spark.functions.media import build_text_bmp

    def short_model(images):
        return ["only one"][: max(len(images) - 1, 0) or 1][:1]

    rows = [
        {"media_ref": f"m{i}", "media_type": "image",
         "content": build_text_bmp(f"line {i}"), "meta": None}
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA).coalesce(1)
    out = {r["media_ref"]: r for r in
           multimodal.ocr_extract(df, short_model).collect()}
    assert all(o["text"] is None for o in out.values())
    assert all(o["error"] and "model" in o["error"] for o in out.values())


def test_sessionize_presplit_equiv_on_giant_user(spark):
    """presplit=True (two-pass day-bucket + stitch) must equal the
    single-pass form exactly — driven by a giant-user fixture (one bot
    with 100k events spanning ~350 days) mixed with normal users and
    midnight-straddling boundary cases, incl. the exact-gap edge.
    The pass-1 exchange must partition on (user, day): that is the
    skew defusal the r3 verdict required as code."""
    import datetime as dt

    from pydoxtools_spark.operators.events import sessionize

    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = []
    # giant user: every 5 min -> one long run of 30-min-gap sessions
    # broken deterministically every 97 events by a 31-min hole
    t = base
    for i in range(100_000):
        rows.append((7, i, t, 1.0))
        t += dt.timedelta(minutes=5 if i % 97 else 31)
    # midnight straddles: 23:50 -> 00:20 (30 min: NO break at gap=30),
    # and 23:00 -> 23:31 same day (31 min: break)
    rows += [(8, 0, dt.datetime(2025, 3, 1, 23, 50), 1.0),
             (8, 1, dt.datetime(2025, 3, 2, 0, 20), 2.0),
             (8, 2, dt.datetime(2025, 3, 2, 0, 51), 4.0),
             (9, 0, dt.datetime(2025, 3, 1, 23, 0), 1.0),
             (9, 1, dt.datetime(2025, 3, 1, 23, 31), 2.0),
             # multi-day hole: must NOT stitch
             (9, 2, dt.datetime(2025, 3, 4, 12, 0), 8.0)]
    ev = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp_ntz, value double")

    single = sessionize(ev, gap_minutes=30)
    two = sessionize(ev, gap_minutes=30, presplit=True)
    key = ["user_id", "session_idx"]
    a = sorted(tuple(r) for r in single.select(
        *key, "session_start", "session_end", "n_events", "sum_value"
    ).collect())
    b = sorted(tuple(r) for r in two.select(
        *key, "session_start", "session_end", "n_events", "sum_value"
    ).collect())
    assert a == b
    # user 8's midnight straddle (23:50 -> 00:20, exactly 30 min)
    # stitched into ONE session; 00:51 is 31 min later -> new session
    u8 = sorted(r for r in b if r[0] == 8)
    assert len(u8) == 2
    assert u8[0][4] == 2 and u8[0][5] == 3.0
    assert u8[1][4] == 1 and u8[1][5] == 4.0
    # plan audit: the event-level exchange keys on (user, day) — the
    # giant user's rows spread across day buckets, no mega-task
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "_day" in plan and "hashpartitioning" in plan
    first_exchange = plan[plan.index("hashpartitioning"):][:200]
    assert "_day" in first_exchange or "user_id" in first_exchange


def test_props_rollup_json_path(spark):
    """props_rollup (operators/events.py): JSON-path int extraction +
    bucket + hash-agg; malformed / missing props land in the NULL
    bucket instead of erroring."""
    from pydoxtools_spark.operators.events import props_rollup

    rows = [("a", '{"k": 13}', 1.0), ("a", '{"k": 3}', 2.0),
            ("b", '{"k": 7}', 4.0), ("a", '{"x": 1}', 8.0),
            ("b", "not json", 16.0), ("b", None, 32.0)]
    df = spark.createDataFrame(rows, "event_type string, props string, value double")
    out = {(r["event_type"], r["k_bucket"]): (r["n"], r["sum_value"])
           for r in props_rollup(df).collect()}
    assert out[("a", 3)] == (2, 3.0)   # 13%10 and 3%10 share a bucket
    assert out[("b", 7)] == (1, 4.0)
    assert out[("a", None)] == (1, 8.0)
    assert out[("b", None)] == (2, 48.0)


def test_render_pdf_pages_box_raster(spark):
    """PDF -> page BMP raster chain (reference PDFImageRenderer): real
    BMP out, dark-pixel count equals the analytic box area under the
    floor/ceil pixel convention, pages separate, junk blobs contained —
    and the raster feeds media_features like any other image."""
    from pydoxtools_spark.functions.pdfparse import build_tiny_pdf
    from pydoxtools_spark.operators.multimodal import (
        media_features, render_pdf_pages)

    pages = [
        {"texts": [(72.0, 700.0, 18.0, "Doc X")]},          # 1 text box
        {"texts": [(72.0, 650.0, 12.0, "p2")],
         "lines": [(100.0, 100.0, 200.0, 100.0)]},          # text + rule
    ]
    blobs = spark.createDataFrame(
        [("g", bytearray(build_tiny_pdf(pages, compress=True))),
         ("bad", bytearray(b"not a pdf"))],
        "doc_id string, content binary")
    out = render_pdf_pages(blobs, scale=0.25)
    rows = {(r["doc_id"], r["p_num"]): r for r in out.collect()}
    import math

    from pydoxtools_spark.functions.pdfparse import HELVETICA_WIDTHS

    def box_px(text, size, x0=72.0):
        # r6: bare Helvetica parses with real AFM advances
        adv = sum(HELVETICA_WIDTHS[c] for c in text) / 1000.0 * size
        return math.ceil((x0 + adv) * 0.25) - math.floor(x0 * 0.25)

    r0 = rows[("g", 0)]
    assert (r0["width"], r0["height"]) == (153, 198)
    assert r0["n_dark"] == box_px("Doc X", 18.0) * 5
    r1 = rows[("g", 1)]
    # 12pt text at (72,650): y 162.5..165.5 -> floor162..ceil166 =
    # 4 tall; the hairline rule: x 25..50, y floor(25)..ceil(25) =
    # 1 tall, 25 wide
    assert r1["n_dark"] == box_px("p2", 12.0) * 4 + 25 * 1
    assert ("bad", None) in rows and rows[("bad", None)]["error"]
    # raster feeds the media pipeline: BMP decodes with exact dims
    feats = media_features(out.filter("error IS NULL").select(
        F.concat_ws("#", "doc_id", "p_num").alias("media_ref"),
        F.lit("image").alias("media_type"), "content",
        F.lit(None).cast("map<string,string>").alias("meta"))).collect()
    assert all(f["decode_error"] is None for f in feats)
    assert all((f["width"], f["height"]) == (153, 198) for f in feats)


def test_render_from_elements_matches_from_bytes(spark):
    """Elements-in rasterizer (one parse per blob when a job needs both
    spans and rasters, r4 verdict item 4): byte-identical BMPs and
    metadata to the from-bytes path, ParseError rows -> error rows,
    max_pages cap honored."""
    from pydoxtools_spark.functions.pdfparse import build_tiny_pdf
    from pydoxtools_spark.operators.multimodal import (
        render_pdf_pages, render_pdf_pages_from_elements)
    from pydoxtools_spark.pipeline import parse_pdf_blobs

    pages = [
        {"texts": [(72.0, 700.0, 18.0, "Doc X")]},
        {"texts": [(72.0, 650.0, 12.0, "p2")],
         "lines": [(100.0, 100.0, 200.0, 100.0)]},
        {"texts": [(72.0, 600.0, 10.0, "p3")]},
    ]
    blobs = spark.createDataFrame(
        [("g", bytearray(build_tiny_pdf(pages, compress=True))),
         ("bad", bytearray(b"not a pdf"))],
        "ref string, content binary")
    els = parse_pdf_blobs(blobs)
    want = {(r["doc_id"], r["p_num"]):
            (r["width"], r["height"], r["n_dark"], bytes(r["content"] or b""))
            for r in render_pdf_pages(
                blobs.withColumnRenamed("ref", "doc_id"), scale=0.25
            ).filter("error IS NULL").collect()}
    got_df = render_pdf_pages_from_elements(els, scale=0.25, partitions=4)
    got = {(r["doc_id"], r["p_num"]):
           (r["width"], r["height"], r["n_dark"], bytes(r["content"] or b""))
           for r in got_df.filter("error IS NULL").collect()}
    assert got == want and len(want) == 3
    errs = {r["doc_id"]: r["error"]
            for r in got_df.filter("error IS NOT NULL").collect()}
    assert list(errs) == ["bad"] and "ParseError" in errs["bad"]
    capped = render_pdf_pages_from_elements(els, scale=0.25, max_pages=2)
    assert capped.filter("error IS NULL").count() == 2


def test_quality_filter_reason_trail(spark):
    """Composite keep/drop: each rule fires alone and in combination;
    empty/NULL docs are too_short keeps-false, clean prose keeps."""
    from pydoxtools_spark.operators import curation

    prose = "the quick brown fox jumps over the lazy dog " * 3  # 27 words
    rows = [
        (1, prose + "and some extra words to pass twenty"),
        (2, "short text"),
        (3, " ".join(str(i) for i in range(25))),
        (4, prose + "pad words here\nsame line\nsame line\nsame line"),
        (5, "1 2 3"),                      # short AND digits
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in curation.quality_filter(df).collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert out[2]["reasons"] == "too_short" and not out[2]["keep"]
    assert out[3]["reasons"] == "low_alpha_ratio"
    assert out[4]["reasons"] == "repetitive_lines"
    assert out[5]["reasons"] == "too_short,low_alpha_ratio"
    assert out[6]["reasons"].startswith("too_short") and not out[6]["keep"]


def test_lang_id_eleven_languages_spark_duckdb_agree(spark):
    """lang_id covers 7 stopword languages + 8 script-scored ones
    (r5 adds hi/ru/th/el): Spark and the DuckDB twin must label every
    sample identically — incl. Japanese-with-kanji beating zh via
    kana, and the unknown fallback — and the confidence twins agree
    too (0.0 exactly for unknown)."""
    import duckdb

    from pydoxtools_spark.operators.textstats import (
        lang_id, lang_id_confidence, lang_id_confidence_sql, lang_id_sql)

    samples = [
        ("en", "the cat sat with the dog and that is fine"),
        ("de", "der hund ist nicht mit der katze und das ist gut"),
        ("fr", "le chat est pour les chiens et pas que pour eux"),
        ("es", "el perro y los gatos no es por que si"),
        ("it", "il cane che corre per la strada non sono una cosa"),
        ("pt", "uma casa para todos com mais gente como dos outros"),
        ("nl", "het huis een van dat niet zijn ook naar hier"),
        ("zh", "这是一个中文句子用于测试语言识别"),
        ("ja", "これは日本語のテストです、漢字も含まれます"),
        ("ko", "이것은 한국어 테스트 문장입니다"),
        ("ar", "هذه جملة اختبار باللغة العربية"),
        ("hi", "यह हिंदी भाषा की परीक्षण पंक्ति है"),
        ("ru", "это тестовое предложение на русском языке"),
        ("th", "นี่คือประโยคทดสอบภาษาไทย"),
        ("el", "αυτή είναι μια δοκιμαστική πρόταση στα ελληνικά"),
        ("unknown", "xyzzy qwerty 12345"),
    ]
    df = spark.createDataFrame(samples, "want string, txt string")
    got = {r["want"]: r["got"] for r in df.select(
        "want", lang_id(F.col("txt")).alias("got")).collect()}
    assert got == {w: w for w, _t in samples}, got
    con = duckdb.connect()
    con.execute("CREATE TABLE t (want VARCHAR, txt VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", samples)
    duck = dict(con.execute(
        f"SELECT want, {lang_id_sql('txt')} FROM t").fetchall())
    assert duck == got
    conf = {r["want"]: r["c"] for r in df.select(
        "want", lang_id_confidence(F.col("txt")).alias("c")).collect()}
    duck_conf = dict(con.execute(
        f"SELECT want, {lang_id_confidence_sql('txt')} FROM t").fetchall())
    assert conf == duck_conf, (conf, duck_conf)
    assert conf["unknown"] == 0.0
    assert all(0.0 < v <= 1.0 for w, v in conf.items() if w != "unknown")


def test_glyph_raster_ocr_round_trip(spark):
    """Glyph-level rendering closes the pdf -> pixels -> text loop
    (r4 verdict item 3): the block-font raster decodes back to the
    EXACT source text via analytic OCR — from bytes and from shared
    elements, with crop_top_pt limiting the raster to the headline
    band, junk blobs contained."""
    from pydoxtools_spark.functions.pdfparse import build_tiny_pdf
    from pydoxtools_spark.operators.multimodal import (
        ocr_glyph_decode, render_pdf_pages, render_pdf_pages_from_elements)
    from pydoxtools_spark.pipeline import parse_pdf_blobs

    lines = ["Doc g 42!", "body with (parens) & punct., x=1+2"]
    pages = [{"texts": [(72.0, 760.0, 12.0, lines[0]),
                        (72.0, 736.0, 12.0, lines[1])]},
             {"texts": [(72.0, 760.0, 12.0, "second page line")]}]
    blobs = spark.createDataFrame(
        [("g", bytearray(build_tiny_pdf(pages, compress=True, use_tj=True,
                                        widths="halfem"))),
         ("bad", bytearray(b"junk"))],
        "doc_id string, content binary")
    rast = render_pdf_pages(blobs, scale=2.0, glyphs=True, crop_top_pt=100.0)
    out = ocr_glyph_decode(rast)
    rows = sorted(
        ((r["doc_id"], r["p_num"], r["line_ord"], r["text"]) for r in
         out.filter("error IS NULL").collect()))
    assert rows == [
        ("g", 0, 0, lines[0]), ("g", 0, 1, lines[1]),
        ("g", 1, 0, "second page line")]
    errs = [r["doc_id"] for r in out.filter("error IS NOT NULL").collect()]
    assert errs == ["bad"]
    # elements-in path produces the identical decode (one parse per
    # blob when spans + rasters are both needed)
    els = parse_pdf_blobs(blobs.withColumnRenamed("doc_id", "ref"),
                          emit_chars=True)
    rast2 = render_pdf_pages_from_elements(els, scale=2.0, glyphs=True,
                                           crop_top_pt=100.0)
    rows2 = sorted(
        ((r["doc_id"], r["p_num"], r["line_ord"], r["text"]) for r in
         ocr_glyph_decode(rast2).filter("error IS NULL").collect()))
    assert rows2 == rows


def test_glyph_font_alphabet_round_trip():
    """Every printable-ASCII char survives paint -> decode at the
    12pt/scale-2 driver geometry, including mixed lines with runs of
    spaces (interior preserved, trailing stripped)."""
    import numpy as np

    from pydoxtools_spark.functions.glyphfont import (
        decode_glyph_page, paint_glyph)

    alphabet = "".join(chr(c) for c in range(33, 127))
    text = alphabet[:40] + "  " + alphabet[40:80]
    px = np.full((40, 12 * (len(text) + 2), 3), 255, dtype=np.uint8)
    x = 24
    for ch in text:
        if ch != " ":
            paint_glyph(px, ord(ch), x, x + 12, 8, 32)
        x += 12
    lines = decode_glyph_page(px)
    assert lines == [(8, text)]
