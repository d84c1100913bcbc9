"""Declared queries: web-text ingest (HTML extraction, domain curation).

Differential-test shape (like `text.py::q_url_extract` and
`q_pii_scrub`): the corpus carries no markup, so each query SYNTHESIZES
a deterministic web artifact from the row's own fields — full HTML
chrome around the document text, a URL with a varying registered
domain — runs the real operator over it, and the oracle derives the
expected output directly from the base fields. The operator must
invert the synthesis exactly (recover the embedded text, drop exactly
the boilerplate, parse exactly the domain) for the value hash to
match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import webtext
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table

_BLOCKLIST = ("example2.com", "example5.com")
_QUOTA = 40


def synthesize_html(docs: DataFrame) -> DataFrame:
    """Wrap each document's text in full HTML chrome: title, style,
    a script whose string literal CONTAINS ``</p>`` (must not split a
    block — script removal precedes block splitting), a link-only nav,
    a short h1, the text in a ``<p>`` with entities appended, and a
    mixed-content footer (link density 2/6 — above the 3/10 cut)."""
    id_s = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>doc "), id_s, F.lit("</title>"),
            F.lit('<style>p{color:#333}</style>'),
            F.lit('<script>var x = "<p>not text</p>";</script></head>'),
            F.lit('<body><nav><a href="/">home</a> <a href="/about">about</a>'
                  ' <a href="/help">help</a></nav>'),
            F.lit("<h1>document "), id_s, F.lit("</h1>"),
            F.lit("<div><p>"), F.col("text"),
            F.lit(" &amp; more &lt;stuff&gt;</p></div>"),
            F.lit('<footer><a href="/tos">terms</a>'
                  ' <a href="/privacy">privacy</a>'
                  " copyright 2026 example corp</footer>"),
            F.lit("</body></html>"),
        ).alias("html"),
    )


def q_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText-lite boilerplate removal (operators/webtext.py::
    html_extract) over synthesized HTML: of the 5 non-empty blocks
    (title, nav, h1, main ``<p>``, footer) exactly the main block
    survives the word-count + link-density filter, and its extracted
    text must byte-match the embedded document text plus the decoded
    entity suffix — compared by md5."""
    docs = load_table(spark, sf_dir, "documents")
    out = webtext.html_extract(synthesize_html(docs))
    return out.select(
        "doc_id",
        "n_blocks_total",
        "n_blocks_kept",
        "n_words_main",
        F.md5("extracted").alias("extracted_md5"),
    )


_HTML_ORACLE = r"""
WITH base AS (
    SELECT doc_id,
           trim(regexp_replace(text || ' & more <stuff>', '\s+', ' ', 'g'))
               AS body
    FROM documents
)
SELECT doc_id,
       CAST(5 AS BIGINT) AS n_blocks_total,
       CAST(1 AS BIGINT) AS n_blocks_kept,
       CAST(len(list_filter(string_split(body, ' '), w -> w <> ''))
            AS BIGINT) AS n_words_main,
       md5(body) AS extracted_md5
FROM base
"""


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain blocklist + per-domain quota
    (operators/webtext.py::domain_curation): URLs synthesized with a
    subdomain and seven rotating registered domains
    (``srcN.sub.exampleK.com``); two domains blocklisted; quota 40
    per domain enforced in deterministic md5 order."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".sub.example"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return webtext.domain_curation(
        urls, blocklist=_BLOCKLIST, quota=_QUOTA
    )


_DOMAIN_ORACLE = f"""
WITH cur AS (
    SELECT doc_id,
           'example' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain,
           (doc_id % 7) IN (2, 5) AS blocked,
           md5('dq1' || CAST(doc_id AS VARCHAR)) AS rk
    FROM documents
)
SELECT doc_id, domain, blocked,
       CAST(row_number() OVER (PARTITION BY domain ORDER BY rk)
            AS BIGINT) AS dom_rank,
       (NOT blocked) AND dom_rank <= {_QUOTA} AS kept
FROM cur
"""


def synthesize_page(docs: DataFrame) -> DataFrame:
    """Multi-line 'web page' per document, exercising every C4 rule:
    a good intro line, a no-terminal-punct line, a body line that is
    word-soup (no punctuation) for ``doc_id % 11 == 0`` docs (starves
    the sentence minimum), a javascript line, a too-short line, a
    closing question, plus a curly-brace code line (``% 13 == 0``) and
    a lorem-ipsum line (``% 17 == 3``) that each ban the whole page."""
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    head = F.array_join(F.slice(toks, 1, 5), " ")
    mid = F.array_join(F.slice(toks, 6, 10), " ")
    tail = F.array_join(F.slice(toks, 16, 100000), " ")
    body = F.when(
        F.col("doc_id") % 11 != 0,
        F.concat(F.lit("Body: "), mid, F.lit(". More details follow. Indeed.")),
    ).otherwise(F.lit("Body words only"))
    page = F.concat(
        F.lit("Intro line: "), head, F.lit(".\n"),
        F.lit("Click here to subscribe now\n"),
        body, F.lit("\n"),
        F.lit("Please enable javascript to continue.\n"),
        F.lit("Ok.\n"),
        F.lit("Closing remarks: "), tail, F.lit("?"),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit("\nfunction f() { return 1; }"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 17 == 3,
            F.lit("\nLorem ipsum dolor sit amet."),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", page.alias("page"))


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line/page cleaning (operators/webtext.py::c4_line_filter)
    over synthesized pages: per doc the operator must keep exactly the
    intro / body / closing lines, drop the subscribe (no terminal
    punctuation), javascript, and two-word lines, count sentence
    marks, and ban pages with braces, lorem ipsum, or a starved
    sentence count — compared by md5 of the reassembled text."""
    docs = load_table(spark, sf_dir, "documents")
    out = webtext.c4_line_filter(synthesize_page(docs))
    return out.select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        "n_sentences",
        "page_kept",
        F.md5("cleaned").alias("cleaned_md5"),
    )


_C4_ORACLE = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), w -> w <> '') AS t
    FROM documents
),
page AS (
    SELECT doc_id,
           -- array_to_string([]) is NULL in DuckDB (not ''): coalesce
           -- to mirror Spark's array_join on short documents
           'Intro line: ' || coalesce(array_to_string(t[1:5], ' '), '')
           || '.' || chr(10)
           || 'Click here to subscribe now' || chr(10)
           || CASE WHEN doc_id % 11 <> 0
                   THEN 'Body: '
                        || coalesce(array_to_string(t[6:15], ' '), '')
                        || '. More details follow. Indeed.'
                   ELSE 'Body words only' END || chr(10)
           || 'Please enable javascript to continue.' || chr(10)
           || 'Ok.' || chr(10)
           || 'Closing remarks: '
           || coalesce(array_to_string(t[16:], ' '), '') || '?'
           || CASE WHEN doc_id % 13 = 0
                   THEN chr(10) || 'function f() { return 1; }'
                   ELSE '' END
           || CASE WHEN doc_id % 17 = 3
                   THEN chr(10) || 'Lorem ipsum dolor sit amet.'
                   ELSE '' END AS pg
    FROM toks
),
split_lines AS (
    SELECT doc_id, pg,
           list_filter(list_transform(string_split(pg, chr(10)),
                                      l -> trim(l)),
                       l -> l <> '') AS nonempty
    FROM page
),
judged AS (
    SELECT doc_id, pg, nonempty,
           list_filter(nonempty,
               l -> regexp_matches(l, '[.!?"]$')
                AND len(list_filter(string_split(l, ' '),
                                    w -> w <> '')) >= 3
                AND NOT regexp_matches(lower(l), '\bjavascript\b')) AS kept
    FROM split_lines
),
stats AS (
    SELECT doc_id,
           CAST(len(nonempty) AS BIGINT) AS n_lines_total,
           CAST(len(kept) AS BIGINT) AS n_lines_kept,
           CAST(coalesce(list_sum(list_transform(kept,
                l -> len(regexp_extract_all(l, '[.!?]')))), 0)
             AS BIGINT) AS n_sentences,
           contains(lower(pg), 'lorem ipsum')
             OR contains(pg, '{') OR contains(pg, '}') AS banned,
           md5(array_to_string(kept, chr(10))) AS cleaned_md5
    FROM judged
)
SELECT doc_id, n_lines_total, n_lines_kept, n_sentences,
       n_sentences >= 5 AND NOT banned AS page_kept,
       cleaned_md5
FROM stats
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL crawl dedup (operators/webtext.py::url_dedup):
    four synthesized variants of the same logical URL per page id —
    uppercase scheme/host with :443 and a trailing slash, a clean
    form, a fragment form, and a tracking-params+fragment form — must
    all collapse to one canonical group; the oracle derives the
    canonical directly from the doc_id arithmetic, so the operator's
    parsing has to invert the synthesis exactly."""
    docs = load_table(spark, sf_dir, "documents")
    page = (F.col("doc_id") % 40).cast("string")
    k = (F.col("doc_id") % 40 % 3).cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTPS://WWW.Example"), k, F.lit(".COM:443/p/"),
                page, F.lit("/?utm_source=x&id="), page,
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("https://www.example"), k, F.lit(".com/p/"),
                page, F.lit("?id="), page,
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://www.example"), k, F.lit(".com/p/"),
                page, F.lit("?id="), page, F.lit("#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.example"), k, F.lit(".com/p/"),
                page, F.lit("?id="), page, F.lit("&utm_campaign=y#sec"),
            )
        )
    )
    return webtext.url_dedup(docs.select("doc_id", url.alias("url")))


_URL_DEDUP_ORACLE = """
WITH cur AS (
    SELECT doc_id,
           'https://www.example' || CAST(doc_id % 40 % 3 AS VARCHAR)
           || '.com/p/' || CAST(doc_id % 40 AS VARCHAR)
           || '?id=' || CAST(doc_id % 40 AS VARCHAR) AS canonical_url
    FROM documents
)
SELECT doc_id, canonical_url,
       CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT)
         AS grp_size,
       doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS keeper
FROM cur
"""


SPECS = [
    QuerySpec("html_text_extract", q_html_text_extract, oracle=_HTML_ORACLE),
    QuerySpec("domain_quota_curation", q_domain_quota, oracle=_DOMAIN_ORACLE),
    QuerySpec("c4_line_filter", q_c4_line_filter, oracle=_C4_ORACLE),
    QuerySpec("url_canonical_dedup", q_url_dedup, oracle=_URL_DEDUP_ORACLE),
]
