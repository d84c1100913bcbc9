"""remove_duplicate_spans (operators/dedup.py) — the consuming half of
exact-substring dedup: tokens covered by any corpus-duplicated k-token
window are deleted, the remainder reassembled in order."""

from __future__ import annotations

from demo_flink_spark.operators.dedup import remove_duplicate_spans

# an 8-token span shared verbatim by docs 1 and 2
SHARED = "alpha beta gamma delta epsilon zeta eta theta"


def _docs(spark):
    rows = [
        (1, f"one two three {SHARED} four five"),
        (2, f"{SHARED} six seven"),
        (3, "unique words only here nothing repeats in this document"),
        (4, "tiny doc"),  # shorter than k -> no windows
        (5, ""),  # empty -> no tokens at all
        # within-doc repeat: the same 8-token window twice in ONE doc
        (6, f"{SHARED} filler {SHARED}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_removed_from_both_docs(spark):
    out = {
        r.doc_id: r for r in remove_duplicate_spans(_docs(spark), k=8).collect()
    }
    assert len(out) == 6
    # docs 1/2: exactly the 8 shared tokens removed, remainder intact
    assert out[1].n_removed == 8
    assert out[1].cleaned_text == "one two three four five"
    assert out[2].n_removed == 8
    assert out[2].cleaned_text == "six seven"


def test_unique_and_short_docs_untouched(spark):
    out = {
        r.doc_id: r for r in remove_duplicate_spans(_docs(spark), k=8).collect()
    }
    assert out[3].n_removed == 0
    assert out[3].cleaned_text.startswith("unique words")
    assert out[4].n_removed == 0
    assert out[4].cleaned_text == "tiny doc"
    assert out[5].n_tokens == 0
    assert out[5].cleaned_text == ""


def test_within_doc_repeat_is_duplication(spark):
    # doc 6 contains the span twice: both occurrences (and the shared
    # copies in docs 1/2) count as duplicated; everything covered by a
    # duplicated window goes, the lone filler token survives
    out = {
        r.doc_id: r for r in remove_duplicate_spans(_docs(spark), k=8).collect()
    }
    assert out[6].n_tokens == 17
    assert out[6].n_removed == 16
    assert out[6].cleaned_text == "filler"


def test_token_counts_conserved(spark):
    for r in remove_duplicate_spans(_docs(spark), k=8).collect():
        kept = len([t for t in r.cleaned_text.split(" ") if t])
        assert kept == r.n_tokens - r.n_removed
