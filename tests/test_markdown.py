"""Markdown/mediawiki extraction branch: parser unit tests + dispatch
routing through the full pipeline (reference block mapping
extract_pandoc.py:98-167; detection document.py:66-113)."""

from pydoxtools_spark.functions.markdown import (
    extract_markdown_spans,
    extract_wiki_spans,
    wiki_to_markdown,
)


def test_atx_and_setext_headers():
    spans = extract_markdown_spans(
        "# Top #\n\nUnder\n=====\n\nDashy\n---\n\n### deep")
    assert spans == [("header", "Top", None), ("header", "Under", None),
                     ("header", "Dashy", None), ("header", "deep", None)]


def test_paragraph_inline_markup_flattened():
    (s,) = extract_markdown_spans(
        "see [docs](http://x) with **bold**, *em* and `code()` inline")
    assert s == ("text", "see docs with bold, em and code() inline", None)


def test_list_runs_and_ordered():
    spans = extract_markdown_spans("- a\n- b\n\ntext\n\n1. x\n2) y")
    assert spans == [("list", "a\nb", None), ("text", "text", None),
                     ("list", "x\ny", None)]


def test_fenced_code_verbatim():
    spans = extract_markdown_spans(
        "```py\ndef f():\n    return '# not a header'\n```")
    assert spans == [("text", "def f():\n    return '# not a header'", None)]


def test_unclosed_fence_runs_to_eof():
    spans = extract_markdown_spans("```\nabc\ndef")
    assert spans == [("text", "abc\ndef", None)]


def test_pipe_table_canonical_render():
    spans = extract_markdown_spans(
        "| h1 | h2 |\n| :-- | --: |\n| a | b |\n| c | d |")
    assert spans == [("table", "h1 | h2\na | b\nc | d", None)]


def test_ragged_table_rows_padded():
    spans = extract_markdown_spans("| h1 | h2 |\n| - | - |\n| only |")
    assert spans == [("table", "h1 | h2\nonly | ", None)]


def test_standalone_image_becomes_image_span():
    spans = extract_markdown_spans("![alt](media://img/3)\n\npara")
    assert spans == [("image", None, "media://img/3"),
                     ("text", "para", None)]


def test_thematic_break_skipped():
    spans = extract_markdown_spans("before\n\n---\n\nafter")
    assert spans == [("text", "before", None), ("text", "after", None)]


def test_wiki_alias():
    assert wiki_to_markdown("== T ==") == "## T"
    spans = extract_wiki_spans(
        "== Top ==\n\ntext {{cite x}} [[Page|label]] end\n\n* a\n# b")
    assert spans == [("header", "Top", None),
                     ("text", "text label end", None),
                     ("list", "a", None), ("list", "b", None)]


def test_pipeline_routes_markdown_text_spans(spark):
    """in_kind='text' + detected markdown -> markdown branch; plain
    text stays on the SQL paragraph path (same extract() call)."""
    from pydoxtools_spark.pipeline import extract
    from pydoxtools_spark.schemas import DOCUMENTS_IN

    md = "# Title\n\n- a\n- b\n\n`x` **y** para"
    plain = "first para\n\nsecond para"
    docs = spark.createDataFrame(
        [{"doc_id": "m", "spans": [
            {"kind": "text", "text": md, "media_ref": None, "offset": 0}]},
         {"doc_id": "p", "spans": [
            {"kind": "text", "text": plain, "media_ref": None, "offset": 0}]}],
        schema=DOCUMENTS_IN)
    rows = {r["doc_id"]: r for r in
            extract(spark, docs, None, parallelism=2).collect()}
    assert [(s["kind"], s["text"], s["offset"]) for s in rows["m"]["spans"]] == [
        ("header", "Title", 0), ("list", "a\nb", 5), ("text", "x y para", 8)]
    assert [(s["kind"], s["text"]) for s in rows["p"]["spans"]] == [
        ("text", "first para"), ("text", "second para")]


def test_markdown_property_random_block_sequences():
    """Property: any block sequence the fixture generator can emit is
    recovered span-for-span (the generator builds goldens BY
    CONSTRUCTION; hypothesis varies the rng seed to walk the block
    grammar — lists/tables/code/images/headers in arbitrary order)."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pydoxtools_spark.fixtures import (
        _gen_markdown_payload, _gen_wiki_payload)
    from pydoxtools_spark.functions.markdown import (
        extract_markdown_spans, extract_wiki_spans)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=0, max_value=10**6),
           st.booleans())
    def check(seed, wiki):
        rng = random.Random(seed)
        if wiki:
            payload, golden = _gen_wiki_payload(rng, 1)
            got = extract_wiki_spans(payload)
        else:
            payload, golden = _gen_markdown_payload(rng, 1)
            got = extract_markdown_spans(payload)
        assert got == golden, seed

    check()


def test_fence_closing_must_match_opening_length():
    """CommonMark 4.5 (advisor r3): a block opened with 4+ fence chars
    is NOT closed by a 3-char fence — nested example fences stay
    inside the block; the closing line must be fence chars only and at
    least as long as the opening run."""
    from pydoxtools_spark.functions.markdown import extract_markdown_spans

    md = "\n".join([
        "# Title",
        "````",
        "example fence below",
        "```",
        "inner code",
        "```",
        "````",
        "after paragraph",
    ])
    spans = extract_markdown_spans(md)
    kinds_texts = [(k, t) for (k, t, _m) in spans]
    assert ("header", "Title") in kinds_texts
    # the whole inner block (incl. the 3-char fences) is ONE code span
    code = [t for (k, t) in kinds_texts if k == "text" and "inner code" in t]
    assert len(code) == 1
    assert "```" in code[0] and "example fence below" in code[0]
    assert ("text", "after paragraph") in kinds_texts
