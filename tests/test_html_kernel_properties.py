"""Property-based robustness tests for the HTML kernel (pure Python —
no Spark session needed).  The reference has no property tests
(SURVEY.md §5.1); this guards the failure-containment contract: the
kernel must never crash on arbitrary input, and well-formed content
must round-trip."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pydoxtools_spark.functions.htmlparse import (
    extract_html_spans,
    extract_title,
    parse_html,
)

# arbitrary text including markupish characters
junk = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)

tag_soup = st.lists(
    st.sampled_from(
        ["<div>", "</div>", "<p>", "</p>", "<ul>", "<li>", "</li>", "</ul>",
         "<a href='x.pdf'>", "</a>", "<table>", "<tr>", "<td>", "</td>",
         "<img src='m'>", "<b>", "< broken", ">>>", "&amp;", "&unknown;",
         "text chunk", "<h1>", "</h1>", "<nav>", "</nav>", "<!-- c -->"]
    ),
    max_size=60,
).map("".join)


@given(junk)
@settings(max_examples=200, deadline=None)
def test_kernel_never_crashes_on_junk(s):
    spans = extract_html_spans(s)
    for kind, text, ref in spans:
        assert kind in {"text", "header", "list", "table", "image", "media"}
        assert text is None or isinstance(text, str)


@given(tag_soup)
@settings(max_examples=200, deadline=None)
def test_kernel_never_crashes_on_tag_soup(s):
    extract_html_spans(s)
    parse_html(s)
    extract_title(s)


@given(st.lists(st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" "),
    min_size=1, max_size=80).map(str.strip).filter(bool),
    min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_paragraphs_round_trip(paras):
    """Well-formed <p> content survives verbatim (normalized), in order."""
    html = "<html><body>" + "".join(f"<p>{p}</p>" for p in paras) + "</body></html>"
    spans = extract_html_spans(html)
    texts = [t for k, t, _ in spans if k == "text"]
    import re
    want = [re.sub(r"\s+", " ", p).strip() for p in paras]
    assert texts == want
