"""Web-text extraction and domain-level curation — the ingest stages a
web-scale training-data pipeline runs BEFORE the text operators in
`textstats.py` ever see a document.

Extends the reference's per-record transform vocabulary (map / flatMap /
filter, `AdvancedWordCount.java:30-42`) to the two operations every
Common-Crawl-shaped corpus build needs first:

- **HTML boilerplate extraction** (`html_extract`): a jusText-lite
  block extractor — split markup into block-level lines, score each by
  word count and link density, keep the content blocks, drop nav /
  footer / chrome. The whole pass is built-in higher-order column
  expressions (`transform` / `filter` / `regexp_*` over the line
  array), so it is a **shuffle-free narrow map** that whole-stage
  codegen runs JVM-side: at 100 TB this stage is pure scan throughput,
  no exchange, no Python.
- **domain curation** (`domain_curation`): registered-domain
  extraction from URLs (`parse_url` + label slicing), a broadcast
  blocklist join (blocklists are row-sized dimensions — millions of
  domains still broadcast comfortably), and a deterministic per-domain
  quota (hash-ranked `row_number` capped at K) — the per-host caps
  CCNet/C4-style pipelines apply so a handful of giant domains cannot
  dominate the corpus. One window shuffle keyed by domain; for a
  pathological mega-domain the same quota can run as a pre-filter on
  the hash value (keep if bucket < quota/estimate) before the exact
  rank — noted, not needed at this corpus shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "html_extract",
    "domain_curation",
    "registered_domain",
    "c4_line_filter",
    "canonicalize_url",
    "url_dedup",
]

# Block-level closers that terminate a text block. Alternation-only
# regex (no backrefs/lookaround) so Java regex (Spark) and RE2 (DuckDB)
# agree leftmost-first — same portability contract as
# textstats.EMAIL_PATTERN.
_BLOCK_BREAK = (
    r"(?i)</(?:p|div|h[1-6]|li|ul|ol|tr|table|nav|footer|header|title|"
    r"blockquote|section|article|body|html)>|<br[^>]*>"
)
_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_STYLE = r"(?is)<style[^>]*>.*?</style>"
_TAG = r"<[^>]*>"
_LINK_TEXT = r"(?i)<a[^>]*>([^<]*)</a>"


def _decode_entities(col: Column) -> Column:
    """Single-pass named-entity decode; `&amp;` last so `&amp;lt;`
    decodes to the literal text `&lt;`, not `<` (the non-recursive
    choice real extractors make)."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _clean_words(col: Column) -> Column:
    """Tag-strip → entity-decode → whitespace-collapse."""
    return F.trim(
        F.regexp_replace(
            _decode_entities(F.regexp_replace(col, _TAG, " ")), r"\s+", " "
        )
    )


def _word_count(col: Column) -> Column:
    return F.size(F.filter(F.split(col, " "), lambda w: w != ""))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    min_words: int = 3,
    density_num: int = 3,
    density_den: int = 10,
) -> DataFrame:
    """jusText-lite main-content extraction from an HTML column.

    Per row (all inside one narrow projection — zero exchanges):

    1. drop ``<script>``/``<style>`` elements (dotall lazy match);
    2. turn block-level closers and ``<br>`` into newlines, split into
       candidate blocks;
    3. per block: extract anchor text (``regexp_extract_all`` group 1),
       strip remaining tags, decode entities, collapse whitespace;
    4. keep blocks with ``>= min_words`` words AND link density
       ``n_link_words / n_words <= density_num/density_den`` — the
       comparison is an exact integer cross-multiply, no float
       boundary to disagree on;
    5. reassemble kept blocks in document order.

    Returns the input key columns plus ``n_blocks_total`` (non-empty
    blocks), ``n_blocks_kept``, ``n_words_main`` and ``extracted``.
    """
    x = F.regexp_replace(F.col(html_col), _SCRIPT, " ")
    x = F.regexp_replace(x, _STYLE, " ")
    x = F.regexp_replace(x, _BLOCK_BREAK, "\n")

    def block(ln: Column) -> Column:
        link_raw = F.array_join(
            F.regexp_extract_all(ln, F.lit(_LINK_TEXT), F.lit(1)), " "
        )
        txt = _clean_words(ln)
        return F.struct(
            txt.alias("txt"),
            _word_count(txt).alias("nw"),
            _word_count(_clean_words(link_raw)).alias("nl"),
        )

    blocks = F.filter(
        F.transform(F.split(x, "\n"), block), lambda s: s["txt"] != ""
    )
    kept = F.filter(
        blocks,
        lambda s: (s["nw"] >= F.lit(min_words))
        & (s["nl"] * F.lit(density_den) <= s["nw"] * F.lit(density_num)),
    )
    other = [c for c in df.columns if c != html_col]
    return df.select(
        *other,
        blocks.alias("_blocks"),
        kept.alias("_kept"),
    ).select(
        *other,
        F.size("_blocks").cast("long").alias("n_blocks_total"),
        F.size("_kept").cast("long").alias("n_blocks_kept"),
        F.aggregate(
            F.transform("_kept", lambda s: s["nw"]),
            F.lit(0).cast("long"),
            lambda acc, nw: acc + nw,
        ).alias("n_words_main"),
        F.array_join(
            F.transform("_kept", lambda s: s["txt"]), "\n"
        ).alias("extracted"),
    )


def registered_domain(host: Column) -> Column:
    """Last two DNS labels of a host — the registered domain under a
    single-label public suffix (``a.b.example.com`` → ``example.com``).
    A real deployment swaps in the public-suffix list as a broadcast
    dimension keyed by the longest matching suffix; the label
    arithmetic here is that join's fallback rule."""
    labels = F.split(host, r"\.")
    return F.when(F.size(labels) < 2, host).otherwise(
        F.array_join(F.slice(labels, -2, 2), ".")
    )


def domain_curation(
    df: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
    blocklist: Sequence[str] = (),
    quota: int = 50,
    salt: str = "dq1",
) -> DataFrame:
    """Blocklist + per-domain quota over a URL-keyed corpus.

    - ``domain``: registered domain of ``parse_url(url, 'HOST')``.
    - ``blocked``: domain appears in the blocklist — checked via a
      **broadcast left join** against the blocklist as a dimension
      table (the realistic shape: production blocklists are millions
      of rows, still broadcast-sized).
    - ``dom_rank``: deterministic 1-based rank of the doc within its
      domain, ordered by ``md5(salt || key)`` — a reproducible
      pseudo-random order on any engine (same trick as
      ``sampling.dataset_split``), so the quota keeps a stable
      uniform sample of each domain rather than "whatever arrived
      first".
    - ``kept``: not blocked AND ``dom_rank <= quota``.

    One exchange total (the per-domain window).
    """
    spark = df.sparkSession
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    cur = df.select(
        key_col, registered_domain(host).alias("domain")
    )
    block_df = spark.createDataFrame(
        [(d,) for d in blocklist] or [(None,)], "domain string"
    ).filter(F.col("domain").isNotNull()).withColumn("blocked", F.lit(True))
    cur = cur.join(F.broadcast(block_df), "domain", "left").withColumn(
        "blocked", F.coalesce("blocked", F.lit(False))
    )
    rank_key = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy("domain").orderBy(rank_key)
    return cur.select(
        key_col,
        "domain",
        "blocked",
        F.row_number().over(w).cast("long").alias("dom_rank"),
    ).withColumn(
        "kept", ~F.col("blocked") & (F.col("dom_rank") <= quota)
    )


# --- C4-style line/page cleaning (Raffel et al. 2020, §2.2) ----------

# A line survives iff it ends in a terminal punctuation mark, carries
# at least `min_words` words, and does not mention javascript; a page
# survives iff its retained lines hold >= `min_sentences` sentences and
# the raw page has neither "lorem ipsum" nor a curly bracket. Both
# regexes are alternation/class-only so Java regex (Spark) and RE2
# (DuckDB) agree.
_TERMINAL_END = r'[.!?"]$'
_JAVASCRIPT = r"\bjavascript\b"
_SENTENCE_MARK = r"[.!?]"


def c4_line_filter(
    df: DataFrame,
    page_col: str = "page",
    min_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4 cleaning rules over a multi-line page column.

    The whole pass is higher-order column expressions (`transform` /
    `filter` / `aggregate` over the line array) inside ONE narrow
    projection — no exchange, no Python, pure scan throughput at
    100 TB, exactly like `html_extract` upstream of it.

    Line rules (C4 §2.2): keep a line iff it (a) ends in a terminal
    punctuation mark (``. ! ? "``), (b) has >= `min_words` words,
    (c) does not contain the word "javascript" (case-insensitive).
    Page rules: drop the page iff retained lines carry fewer than
    `min_sentences` sentence-ending marks, or the RAW page contains
    "lorem ipsum" (case-insensitive) or a curly bracket.

    Returns the input key columns plus ``n_lines_total`` (non-empty
    after trim), ``n_lines_kept``, ``n_sentences``, ``page_kept`` and
    ``cleaned`` (retained lines re-joined; computed even for dropped
    pages so callers can audit what the filter would have kept).
    """
    raw = F.coalesce(F.col(page_col), F.lit(""))  # NULL page = empty
    # NOTE: the lambda must be explicit — F.trim passed bare would
    # receive transform's (element, index) pair as (col, trim chars)
    lines = F.filter(
        F.transform(F.split(raw, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(_TERMINAL_END)
        & (_word_count(ln) >= F.lit(min_words))
        & ~F.lower(ln).rlike(_JAVASCRIPT),
    )
    other = [c for c in df.columns if c != page_col]
    staged = df.select(
        *other, lines.alias("_lines"), kept.alias("_kept"), raw.alias("_raw")
    ).select(
        *other,
        F.size("_lines").cast("long").alias("n_lines_total"),
        F.size("_kept").cast("long").alias("n_lines_kept"),
        F.aggregate(
            F.col("_kept"),
            F.lit(0).cast("long"),
            lambda acc, ln: acc + F.regexp_count(ln, F.lit(_SENTENCE_MARK)),
        ).alias("n_sentences"),
        F.array_join("_kept", "\n").alias("cleaned"),
        (
            F.contains(F.lower("_raw"), F.lit("lorem ipsum"))
            | F.contains(F.col("_raw"), F.lit("{"))
            | F.contains(F.col("_raw"), F.lit("}"))
        ).alias("_page_banned"),
    )
    return staged.select(
        *other,
        "n_lines_total",
        "n_lines_kept",
        "n_sentences",
        (
            (F.col("n_sentences") >= F.lit(min_sentences))
            & ~F.col("_page_banned")
        ).alias("page_kept"),
        "cleaned",
    )


# Tracking parameters stripped during URL canonicalization (the
# CCNet/C4-style crawl-dedup key; extend per deployment).
_TRACKING_PARAM = r"^(utm_[a-z0-9_]+|gclid|fbclid|ref)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for crawl-level deduplication.

    Lowercases scheme and host, drops default ports (:80 http /
    :443 https), strips the fragment, removes tracking query
    parameters (keeping the rest in their original order), and trims
    a trailing slash from non-root paths. Pure regexp/array column
    expressions — RE2-safe character classes only, so the DuckDB
    oracle applies the identical grammar.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).otherwise(hostport)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    rawq = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM),
    )
    query = F.array_join(kept, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    # Scheme-less / malformed inputs ('example.com?id=1', '//cdn/x',
    # relative paths) make every component regex come back empty, so
    # distinct inputs would all collapse to '://?...' — one canonical
    # group, i.e. silent data loss in url_dedup. Pass them through
    # unchanged instead: an uncanonicalizable URL stays its own key.
    return F.when(scheme != "", canonical).otherwise(url)


def url_dedup(
    df: DataFrame, url_col: str = "url", key_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL crawl deduplication: annotate each row with its
    canonical URL, the canonical group's size, and whether this row is
    the group's keeper (lowest key — deterministic).

    The canonicalization is a zero-exchange narrow map; the dedup is
    ONE canonical-URL-keyed window (count + min over the group) —
    the same single-exchange shape as `domain_curation`. At crawl
    scale the canonical key is near-unique, so the window groups are
    tiny and skew-free.
    """
    cur = df.select(
        key_col, canonicalize_url(F.col(url_col)).alias("canonical_url")
    )
    w = Window.partitionBy("canonical_url")
    return cur.select(
        key_col,
        "canonical_url",
        F.count(F.lit(1)).over(w).cast("long").alias("grp_size"),
        (F.col(key_col) == F.min(key_col).over(w)).alias("keeper"),
    )
