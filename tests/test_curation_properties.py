"""Randomized-batch equivalence tests for the training-pipeline ops:
a seeded random corpus (planted duplicates, newlines, empties, short
docs) goes through the Spark operators ONCE, and every row is compared
against an independent pure-Python implementation of the published
semantics.  Catches convention drift (1-based positions, interval
adjacency, canonical-id policy, tie-breaks) that fixture tests with a
single shape would miss."""

import hashlib
import math
import random

from pyspark.sql import functions as F


def _norm_words(text):
    # replicate the engines' normalization EXACTLY: SQL trim() strips
    # SPACES only (not \n), then \s+ -> ' ', then split on ' ' —
    # leading/trailing newlines therefore produce empty tokens, unlike
    # python's .strip()
    import re

    t = re.sub(r"\s+", " ", text.lower().strip(" "))
    return t.split(" ")


def _gen_corpus(n_docs=120, seed=7):
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(12)]
    shared = ["sh%d" % i for i in range(9)]  # planted 9-word run
    docs = []
    for i in range(n_docs):
        k = rng.randrange(0, 40)
        words = [rng.choice(vocab) for _ in range(k)]
        if i % 4 == 0 and k > 3:
            p = rng.randrange(0, k)
            words[p:p] = shared
        text = " ".join(words)
        if i % 5 == 0 and words:
            # inject newlines so line-based signals see structure
            text = text.replace(" ", "\n", 2)
        docs.append((i, text))
    docs.append((n_docs, ""))          # empty
    docs.append((n_docs + 1, "  \n "))  # whitespace only
    return docs


def _windows(words, n):
    return [(s + 1, " ".join(words[s:s + n])) for s in
            range(len(words) - n + 1)]


def _flagged_hashes(docs, n, min_docs):
    seen = {}
    for i, t in docs:
        for _, g in set(_windows(_norm_words(t), n)):
            seen.setdefault(g, set()).add(i)
    return {g for g, ids in seen.items() if len(ids) >= min_docs}


def _merge(intervals):
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def test_duplicated_window_spans_matches_python_reference(spark):
    from pydoxtools_spark.operators import dedup

    docs = _gen_corpus()
    n = 5
    flagged = _flagged_hashes(docs, n, 2)
    want = {}
    for i, t in docs:
        iv = [(s, s + n - 1) for s, g in _windows(_norm_words(t), n)
              if g in flagged]
        for s, e in _merge(iv):
            want[(i, s, e)] = True
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["doc_id"], r["start_word"], r["end_word"]): True for r in
           dedup.duplicated_window_spans(df, n=n, min_docs=2).collect()}
    assert got == want


def test_drop_duplicated_windows_matches_python_reference(spark):
    from pydoxtools_spark.operators import dedup

    docs = _gen_corpus()
    n = 5
    seen = {}
    for i, t in docs:
        for _, g in set(_windows(_norm_words(t), n)):
            seen.setdefault(g, set()).add(i)
    canon = {g: min(ids) for g, ids in seen.items() if len(ids) >= 2}
    want = {}
    for i, t in docs:
        words = _norm_words(t)
        iv = _merge([
            (s, s + n - 1) for s, g in _windows(words, n)
            if g in canon and canon[g] != i
        ])
        cut = {p for s, e in iv for p in range(s, e + 1)}
        keep = [w for p, w in enumerate(words, start=1) if p not in cut]
        want[i] = (" ".join(keep), len(cut))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: (r["clean_text"], r["words_cut"]) for r in
           dedup.drop_duplicated_windows(df, n=n, min_docs=2).collect()}
    assert got == want


def test_repetition_signals_match_python_reference(spark):
    from pydoxtools_spark.operators import curation

    docs = _gen_corpus()
    want = {}
    for i, t in docs:
        lines = [ln.strip(" ") for ln in t.split("\n")
                 if ln.strip(" ") != ""]
        if lines:
            from collections import Counter

            lc = Counter(lines)
            tot = len(lines)
            dlf = (tot - len(lc)) / tot
            dlc = (sum((c - 1) * len(s) for s, c in lc.items())
                   / sum(c * len(s) for s, c in lc.items()))
        else:
            dlf = dlc = 0.0

        def gram_mass(nn):
            from collections import Counter

            ws = _norm_words(t)
            gs = Counter(g for _, g in _windows(ws, nn))
            if not gs:
                return 0.0, 0.0
            mass = sum(c * len(g) for g, c in gs.items())
            mx = max(gs.values())
            top_len = max(len(g) for g, c in gs.items() if c == mx)
            dup = sum(c * len(g) for g, c in gs.items() if c > 1)
            return mx * top_len / mass, dup / mass

        topf, _ = gram_mass(2)
        _, dupf = gram_mass(5)
        want[i] = (dlf, dlc, topf, dupf)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           curation.repetition_signals(df).collect()}
    for i, (dlf, dlc, topf, dupf) in want.items():
        r = got[i]
        assert abs(r["dup_line_frac"] - dlf) < 1e-9, i
        assert abs(r["dup_line_char_frac"] - dlc) < 1e-9, i
        assert abs(r["top_ngram_frac"] - topf) < 1e-9, i
        assert abs(r["dup_ngram_frac"] - dupf) < 1e-9, i


def test_quota_sample_matches_python_reference(spark):
    from pydoxtools_spark.operators import curation

    docs = [(i, f"g{i % 5}") for i in range(173)]
    q = 11
    by_g = {}
    for i, g in docs:
        by_g.setdefault(g, []).append(i)
    want = set()
    for g, ids in by_g.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rank, i in enumerate(ids[:q], start=1):
            want.add((i, g, rank))
    df = spark.createDataFrame(docs, ["doc_id", "domain"])
    got = {tuple(r) for r in
           curation.quota_sample(df, "domain", q).collect()}
    assert got == want


def test_unigram_logprob_matches_python_reference(spark):
    from collections import Counter

    from pydoxtools_spark.operators import curation

    docs = [(i, t) for i, t in _gen_corpus() if _norm_words(t) != [""]]
    vocab = Counter(w for _, t in docs for w in _norm_words(t) if w)
    total = sum(vocab.values())
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["logprob"] for r in
           curation.unigram_logprob(df).collect()}
    for i, t in docs:
        ws = [w for w in _norm_words(t) if w]
        if not ws:
            assert i not in got
            continue
        want = math.log(total) - sum(math.log(vocab[w]) for w in ws) / len(ws)
        assert abs(got[i] - want) < 1e-9, i


def test_giant_doc_skew_sanity(spark):
    """A single giant document (30k words, heavy internal repetition)
    next to tiny ones: window detection, the cut, and repetition
    signals all stay bounded (per-doc work is one task but linear) and
    return sane values — the skew shape a web corpus WILL contain."""
    from pydoxtools_spark.operators import curation, dedup

    rng = random.Random(3)
    giant = " ".join(rng.choice(["a", "b", "c", "d"]) for _ in range(30000))
    shared = " ".join(f"s{i}" for i in range(20))
    rows = [(1, giant + " " + shared), (2, "tiny " + shared),
            (3, "unrelated words only here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    spans = dedup.duplicated_window_spans(df, n=8, min_docs=2).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["start_word"], r["end_word"]))
    # doc1's 4-letter soup repeats across... only within itself (1 doc)
    # -> NOT flagged; the planted 20-word run IS (docs 1+2)
    assert any(e - s + 1 >= 20 for s, e in by_doc.get(1, []))
    assert any(e - s + 1 >= 20 for s, e in by_doc.get(2, []))
    assert 3 not in by_doc

    cut = {r["doc_id"]: r for r in
           dedup.drop_duplicated_windows(df, n=8, min_docs=2).collect()}
    assert cut[1]["words_cut"] == 0          # canonical (min id) keeps
    assert cut[2]["words_cut"] >= 20         # run cut from doc 2
    assert cut[3]["words_cut"] == 0

    sig = {r["doc_id"]: r for r in
           curation.repetition_signals(df).collect()}
    assert sig[1]["dup_ngram_frac"] > 0.9    # 4-letter soup: all dup 5-grams
    assert sig[3]["dup_ngram_frac"] == 0.0


def test_sessionize_matches_python_reference(spark):
    import datetime as dt

    from pydoxtools_spark.operators.events import sessionize

    rng = random.Random(11)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(8):
        t = t0
        for _ in range(rng.randrange(0, 25)):
            t = t + dt.timedelta(minutes=rng.choice([1, 5, 29, 30, 31, 200]))
            rows.append((eid, t, u, round(rng.uniform(0, 10), 2)))
            eid += 1
    # python reference
    want = {}
    by_u = {}
    for e, t, u, v in rows:
        by_u.setdefault(u, []).append((t, e, v))
    for u, evs in by_u.items():
        evs.sort()
        idx = 0
        cur = None
        for t, e, v in evs:
            if cur is None or (t - cur["end"]).total_seconds() * 1e6 > 30 * 60e6:
                idx += 1
                cur = {"start": t, "end": t, "n": 1, "sum": v}
                want[(u, idx)] = cur
            else:
                cur["end"] = t
                cur["n"] += 1
                cur["sum"] += v
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double")
    got = {(r["user_id"], r["session_idx"]): r for r in
           sessionize(df, gap_minutes=30).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        r = got[k]
        assert r["session_start"] == w["start"] and \
            r["session_end"] == w["end"], k
        assert r["n_events"] == w["n"], k
        assert abs(r["sum_value"] - round(w["sum"], 4)) < 1e-6, k


def test_pack_sequences_matches_python_reference(spark):
    """Concat-and-chunk packing: per-shard streams are contiguous
    (each start at 0, gapless through contrib = n_tokens + 1),
    window math is consistent, and the assignment is stable under
    input order / extra partitions (hash-deterministic)."""
    import hashlib

    from pydoxtools_spark.operators.curation import pack_sequences

    rows = [(i, (i * 7) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: r for r in
           pack_sequences(df, seq_len=32, shards=4).collect()}
    assert len(got) == 200

    # python reference: same md5 shard + order + cumsum
    by_shard = {}
    for i, n in rows:
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_shard.setdefault(int(h[:8], 16) % 4, []).append((h, i, n))
    for shard, docs in by_shard.items():
        docs.sort()
        pos = 0
        for h, i, n in docs:
            r = got[i]
            assert r["shard"] == shard, i
            assert r["start_pos"] == pos, i
            assert r["seq_index"] == pos // 32, i
            assert r["seq_offset"] == pos % 32, i
            pos += n + 1

    # stability: reversed input order + different partitioning
    # produces the identical assignment
    df2 = spark.createDataFrame(list(reversed(rows)),
                                "doc_id long, n_tokens long").repartition(7)
    got2 = {r["doc_id"]: (r["shard"], r["start_pos"]) for r in
            pack_sequences(df2, seq_len=32, shards=4).collect()}
    assert got2 == {k: (v["shard"], v["start_pos"])
                    for k, v in got.items()}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)


def test_filter_url_blocklist_suffix_semantics(spark):
    """Host matches when it or ANY parent domain is listed; ports,
    query strings, schemes and case don't confuse the host extract;
    schemeless rows keep (no host = no evidence)."""
    from pydoxtools_spark.operators.curation import filter_url_blocklist

    rows = [
        (0, "http://news.BAD.com/article?x=1"),     # parent match
        (1, "https://ok.site.org/p"),               # clean
        (2, "http://x.y.spam.net:8080/z"),          # deep parent + port
        (3, "http://bad.com/"),                     # exact match
        (4, "http://notbad.com/"),                  # NOT a suffix match
        (5, "ftp://sub.bad.com"),                   # other scheme
        (6, "no-scheme-at-all"),                    # no host -> keep
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("bad.com",), ("SPAM.net",)],
                               "domain string")
    got = {r["doc_id"]: r for r in
           filter_url_blocklist(df, bl).collect()}
    assert [got[i]["keep"] for i in range(7)] == \
        [False, True, False, False, True, False, True]
    assert got[0]["blocked_domain"] == "bad.com"
    assert got[2]["blocked_domain"] == "spam.net"
    assert got[0]["host"] == "news.bad.com"
    assert got[6]["host"] == ""
    # scale-shape invariant: the doc table never shuffles (the only
    # exchanges below the final join feed the DISTINCT-host side)
    plan = filter_url_blocklist(
        df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_plan_single_exchange(spark):
    """Scale-shape invariant: packing is ONE hash exchange on shard +
    one within-partition sort + Window — never a global sort."""
    import re

    from pyspark.sql import functions as F

    from pydoxtools_spark.operators.curation import pack_sequences

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("n_tokens"))
    plan = pack_sequences(df, 64, shards=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "rangepartitioning" not in plan.lower()  # no global sort
    assert len(re.findall(r"\bSort\b", plan)) == 1
