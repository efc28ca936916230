"""duplicated_substring_spans (the `dup_spans` section of
dedup_ngram_jaccard): exact cross-document duplicated substrings merged
to maximal per-document spans — semantics pinned on hand-built corpora
where the expected spans are computed by eye."""

from twilio_event_streams_reporting_example_spark.operators.dedup import (
    duplicated_substring_spans,
)


def _spans(spark, rows, min_len):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_substring_spans(df, min_len=min_len).collect()
    return sorted((r.doc_id, r.span_start, r.span_end, r.n_grams) for r in out)


def test_shared_block_is_found_and_merged(spark):
    """Docs 1 and 2 share a 12-char block; with min_len=10 the three
    overlapping 10-gram hits (starts 1-3 within the block) merge into
    ONE maximal span covering exactly the shared block."""
    shared = "ABCDEFGHIJKL"  # 12 chars
    rows = [
        (1, shared + "xxxxxx"),
        (2, "yyyy" + shared + "zz"),
        (3, "no overlap here at all.."),
    ]
    got = _spans(spark, rows, 10)
    # doc 1: block at 1..12; doc 2: block at 5..16 (1-based inclusive)
    assert got == [(1, 1, 12, 3), (2, 5, 16, 3)]


def test_disjoint_repeats_yield_separate_islands(spark):
    """Two duplicated blocks separated by a unique gap longer than
    min_len must NOT merge."""
    a = "AAAAAAAAAA"  # 10
    b = "BBBBBBBBBB"  # 10
    rows = [
        (1, a + "-unique-gap-1-" + b),
        (2, a + "=another=gap==" + b),
    ]
    got = _spans(spark, rows, 10)
    assert got == [
        (1, 1, 10, 1), (1, 25, 34, 1),
        (2, 1, 10, 1), (2, 25, 34, 1),
    ]


def test_within_doc_repeat_alone_is_not_cross_doc(spark):
    """A substring repeated twice INSIDE one document but in no other
    document is invisible to the cross-document pass (count distinct
    docs >= 2, not count occurrences)."""
    rep = "0123456789"
    rows = [(1, rep + "middle" + rep), (2, "completely different text!")]
    assert _spans(spark, rows, 10) == []


def test_short_documents_are_skipped(spark):
    rows = [(1, "tiny"), (2, "tiny")]
    assert _spans(spark, rows, 10) == []


def test_identical_documents_span_full_text(spark):
    text = "the same exact document text, twice over"  # 40 chars
    rows = [(1, text), (2, text)]
    n = len(text)
    got = _spans(spark, rows, 10)
    assert got == [(1, 1, n, n - 9), (2, 1, n, n - 9)]
