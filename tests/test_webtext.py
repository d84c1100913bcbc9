"""Edge cases for operators/webtext.py: HTML extraction and domain
curation on handcrafted rows (the declared queries cover the corpus
differential test; these pin the block/entity/link semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_flink_spark.operators.webtext import (
    domain_curation,
    html_extract,
    registered_domain,
)


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_extract(df, **kw).collect()[0]


def test_script_with_embedded_closer_does_not_split_blocks(spark):
    # the </p> inside the script string must vanish WITH the script,
    # not create a block boundary
    r = _extract(
        spark,
        '<p>alpha beta gamma</p><script>var x = "<p>fake block</p>";'
        "</script><p>delta epsilon zeta</p>",
    )
    assert r["extracted"] == "alpha beta gamma\ndelta epsilon zeta"
    assert r["n_blocks_total"] == 2 and r["n_blocks_kept"] == 2


def test_entities_decode_after_tag_strip(spark):
    # &lt;b&gt; decodes to literal <b> text, never re-parsed as a tag;
    # &amp;lt; decodes once to &lt;
    r = _extract(spark, "<p>one &lt;b&gt; two &amp;lt; three</p>")
    assert r["extracted"] == "one <b> two &lt; three"
    assert r["n_words_main"] == 5


def test_link_density_drops_nav_keeps_prose_with_inline_link(spark):
    html = (
        '<div><a href="/a">x</a> <a href="/b">y</a> <a href="/c">z</a></div>'
        '<p>the quick brown fox sees a <a href="/w">wiki link</a> here</p>'
    )
    r = _extract(spark, html)
    # nav block: 3 words, 3 link words -> density 1 -> dropped;
    # prose: 9 words, 2 link words -> 2*10 <= 9*3 -> kept
    assert r["n_blocks_total"] == 2 and r["n_blocks_kept"] == 1
    assert r["extracted"] == "the quick brown fox sees a wiki link here"


def test_short_blocks_dropped_and_br_splits(spark):
    r = _extract(spark, "<p>tiny one<br>long enough block here</p>")
    assert r["n_blocks_total"] == 2
    assert r["extracted"] == "long enough block here"


def test_empty_and_tag_only_html(spark):
    r = _extract(spark, "<html><body><div></div></body></html>")
    assert r["n_blocks_total"] == 0 and r["n_blocks_kept"] == 0
    assert r["extracted"] == ""


def test_nbsp_and_whitespace_collapse(spark):
    r = _extract(spark, "<p>alpha&nbsp;&nbsp;beta   gamma\tdelta</p>")
    assert r["extracted"] == "alpha beta gamma delta"


def test_registered_domain_label_slicing(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)],
        "host string",
    ).select(registered_domain(F.col("host")).alias("d"))
    assert [r["d"] for r in df.collect()] == [
        "example.com",
        "example.com",
        "localhost",
    ]


def test_domain_curation_blocklist_quota_determinism(spark):
    rows = [(i, f"https://w.sub.d{i % 2}.org/p/{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_curation(df, blocklist=["d1.org"], quota=5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert all(got[i]["domain"] == f"d{i % 2}.org" for i in range(20))
    assert all(got[i]["blocked"] for i in range(1, 20, 2))
    assert not any(got[i]["kept"] for i in range(1, 20, 2))
    kept_even = [i for i in range(0, 20, 2) if got[i]["kept"]]
    assert len(kept_even) == 5  # quota binds: 10 candidates, 5 kept
    # ranks within a domain are a permutation of 1..10
    assert sorted(got[i]["dom_rank"] for i in range(0, 20, 2)) == list(
        range(1, 11)
    )
    # deterministic across runs
    again = {r["doc_id"]: r["kept"] for r in out.collect()}
    assert again == {i: got[i]["kept"] for i in range(20)}


def _c4(spark, page, **kw):
    from demo_flink_spark.operators.webtext import c4_line_filter

    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    return c4_line_filter(df, **kw).collect()[0]


def test_c4_line_rules(spark):
    page = "\n".join(
        [
            "This line ends properly.",  # kept
            "no terminal punctuation here",  # dropped: punctuation
            "Too short.",  # dropped: 2 words < 3
            "Enable JavaScript to continue.",  # dropped: javascript
            'He said "stop right there."',  # kept: ends in quote
            "  padded line survives trim.  ",  # kept after trim
            "",  # empty: not counted at all
            "Is this enough? Yes. Indeed it is!",  # kept: 3 sentences
        ]
    )
    r = _c4(spark, page)
    assert r["n_lines_total"] == 7  # empties vanish before counting
    assert r["n_lines_kept"] == 4
    # sentence marks in kept lines: 1 + 1 ('."' holds one '.') + 1 + 3
    assert r["n_sentences"] == 6
    assert r["page_kept"]
    assert r["cleaned"].split("\n") == [
        "This line ends properly.",
        'He said "stop right there."',
        "padded line survives trim.",
        "Is this enough? Yes. Indeed it is!",
    ]


def test_c4_page_bans(spark):
    good = "One good sentence. Two! Three? Four. Five here too."
    # curly brace bans the page even though the line itself is dropped
    r = _c4(spark, good + "\nif (x) { fail }")
    assert not r["page_kept"] and r["n_sentences"] == 5
    # lorem ipsum bans case-insensitively, wherever it appears
    r = _c4(spark, good + "\nLOREM IPSUM dolor sit amet.")
    assert not r["page_kept"]
    # starved sentence count bans; threshold is configurable
    r = _c4(spark, "Only two sentences. Right here.")
    assert not r["page_kept"]
    assert _c4(spark, "Only two sentences. Right here.", min_sentences=2)[
        "page_kept"
    ]
    # javascript as a SUBSTRING does not kill the line (word boundary)
    r = _c4(spark, good + "\nThe javascripty framework is fine.")
    assert r["n_lines_kept"] == 2 and r["page_kept"]


def test_c4_empty_and_wordcount_boundary(spark):
    r = _c4(spark, "")
    assert r["n_lines_total"] == 0 and not r["page_kept"]
    assert r["cleaned"] == ""
    # exactly min_words words is kept
    assert _c4(spark, "Three word line.", min_sentences=1)["n_lines_kept"] == 1


def test_canonicalize_url_rules(spark):
    from demo_flink_spark.operators.webtext import canonicalize_url

    cases = [
        # scheme/host case + default port
        ("HTTPS://WWW.Ex.COM:443/a", "https://www.ex.com/a"),
        ("HTTP://ex.com:80/a", "http://ex.com/a"),
        # non-default port survives
        ("https://ex.com:8443/a", "https://ex.com:8443/a"),
        # :80 on https is NOT a default port
        ("https://ex.com:80/a", "https://ex.com:80/a"),
        # trailing slash trimmed, root kept
        ("https://ex.com/a/b/", "https://ex.com/a/b"),
        ("https://ex.com/", "https://ex.com/"),
        ("https://ex.com", "https://ex.com"),
        # fragment dropped, tracking params stripped, order kept
        ("https://ex.com/p?b=2&utm_source=x&a=1#frag", "https://ex.com/p?b=2&a=1"),
        ("https://ex.com/p?utm_campaign=y&gclid=z", "https://ex.com/p"),
        ("https://ex.com/p?ref=feed&fbclid=1&q=ok", "https://ex.com/p?q=ok"),
        # path CASE is preserved (only scheme/host fold)
        ("https://ex.com/CaseSensitive", "https://ex.com/CaseSensitive"),
        # utm-like param that is NOT tracking (utmx) survives
        ("https://ex.com/p?utmx=1", "https://ex.com/p?utmx=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_url_dedup_groups_and_keeper(spark):
    from demo_flink_spark.operators.webtext import url_dedup

    rows = [
        (3, "https://EX.com/a?utm_source=s"),
        (1, "https://ex.com/a/"),
        (2, "https://ex.com/a#f"),
        (9, "https://ex.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert out[1]["grp_size"] == 3 and out[1]["keeper"]
    assert out[2]["grp_size"] == 3 and not out[2]["keeper"]
    assert not out[3]["keeper"]
    assert out[9]["grp_size"] == 1 and out[9]["keeper"]


def test_canonicalize_url_idempotent_bulk(spark):
    # canonical output must be a fixed point of the grammar — checked
    # over seeded structured-random URLs in ONE Spark pass
    import random

    from demo_flink_spark.operators.webtext import canonicalize_url

    rng = random.Random(7)
    schemes = ["http", "HTTPS", "https", "HTTP"]
    hosts = ["Ex.COM", "a.b.example.org", "X.Y", "site.net:8080",
             "s.com:443", "h.org:80"]
    paths = ["", "/", "/a", "/a/b/", "/CaseSens/p/", "/x//y/"]
    queries = ["", "?a=1", "?utm_source=x", "?b=2&utm_cmp=1&a=1",
               "?ref=r&q=ok", "?gclid=g"]
    frags = ["", "#f", "#sec2"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(400)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonicalize_url(F.col("url")).alias("c1")
    ).select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    for r in out:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


def test_c4_cleaned_text_is_stable(spark):
    # re-cleaning already-cleaned text keeps every line and sentence
    from demo_flink_spark.operators.webtext import c4_line_filter

    page = "\n".join(
        [
            "A good first sentence here.",
            "drop me, no punctuation",
            "Ok.",
            "Another fine line with words. And two marks!",
            "Final thoughts are recorded here?",
        ]
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    first = c4_line_filter(df, min_sentences=1).collect()[0]
    again = c4_line_filter(
        spark.createDataFrame(
            [(1, first["cleaned"])], "doc_id long, page string"
        ),
        min_sentences=1,
    ).collect()[0]
    assert again["cleaned"] == first["cleaned"]
    assert again["n_lines_kept"] == first["n_lines_kept"]
    assert again["n_sentences"] == first["n_sentences"]


def test_canonicalize_url_malformed_passthrough(spark):
    """Scheme-less / malformed URLs pass through unchanged instead of
    all collapsing to '://?...' (which made url_dedup drop distinct
    documents as duplicates of each other)."""
    from demo_flink_spark.operators.webtext import canonicalize_url

    raw = [
        "example.com?id=1",
        "other.org?id=1",
        "//cdn.example.com/asset.js",
        "/relative/path?x=1",
        "not a url at all",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    out = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert out == raw  # unchanged, therefore still distinct dedup keys
