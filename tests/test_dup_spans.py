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


def _selected(g: str) -> bool:
    """The content-keyed selection rule, recomputed independently:
    md5 bucket 0 of SPAN_SAMPLE_MOD."""
    import hashlib

    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        SPAN_SAMPLE_MOD,
    )

    return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % SPAN_SAMPLE_MOD == 0


def _sampled_spans(spark, rows, min_len):
    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        sampled_substring_spans,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampled_substring_spans(df, min_len=min_len).collect()
    return sorted((r.doc_id, r.span_start, r.span_end, r.n_grams) for r in out)


def test_sampled_selection_is_content_keyed_not_positional(spark):
    """A long shared block planted at DIFFERENT offsets in two docs —
    the phase case a positional stride would miss. Content-keyed
    selection picks the same grams of the block in both copies, so
    both docs get a span; expected hits recomputed with hashlib."""
    import string

    block = (string.ascii_letters + string.digits + ".,;:!?-_ ") * 8  # ~570
    rows = [
        (1, "unique-prefix-one///" + block + "###tail-a"),
        (2, "x" + block + "@@@different-tail-entirely"),
    ]
    L = 40
    got = _sampled_spans(spark, rows, L)
    # independent expectation: selected shared grams exist
    shared_hits_1 = [
        p + 21 for p in range(len(block) - L + 1) if _selected(block[p : p + L])
    ]
    assert shared_hits_1, "test corpus must select at least one gram"
    assert {d for d, *_ in got} == {1, 2}
    # every span lies inside the planted block's footprint in each doc
    for d, s, e, n in got:
        off = 21 if d == 1 else 2  # 1-based block start per doc
        assert s >= off and e <= off + len(block) - 1, (d, s, e)


def test_sampled_misses_only_unselected_short_blocks(spark):
    """A shared block whose grams are ALL unselected is invisible to
    the sampled pass (the documented coverage trade) while the exact
    pass still finds it — pin the relationship on a crafted corpus."""
    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    base = "The quick brown fox jumps over the lazy dog 0123456789"  # 55
    L = 40
    grams = [base[p : p + L] for p in range(len(base) - L + 1)]
    if any(_selected(g) for g in grams):
        # corpus-dependent: if a gram IS selected, both passes agree —
        # assert that instead (still pins determinism)
        rows = [(1, base + "-suffix-one"), (2, "pre//" + base)]
        assert _sampled_spans(spark, rows, L)
        return
    rows = [(1, base + "-suffix-one"), (2, "pre//" + base)]
    assert _sampled_spans(spark, rows, L) == []
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicated_substring_spans(df, min_len=L).count() > 0


def test_fused_sections_match_standalone_plans(spark):
    """The round-12 fused span path (one tagged island chain inside
    dedup_ngram_jaccard) must emit EXACTLY the rows of the standalone
    operators on the same corpus — the fusion is a plan change, never
    a semantics change."""
    from twilio_event_streams_reporting_example_spark.operators.dedup import (
        duplicated_substring_spans,
        sampled_substring_spans,
    )
    from twilio_event_streams_reporting_example_spark.registry import (
        all_queries,
        release_caches,
    )
    from twilio_event_streams_reporting_example_spark.sources.tables import (
        load_table,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", sf_dir)
    fused = all_queries()["dedup_ngram_jaccard"].fn(spark, sf_dir)
    got = {
        sec: sorted(
            (r.k1, r.k2, r.m1, r.m2)
            for r in fused.where(fused.section == sec).collect()
        )
        for sec in ("dup_spans", "dup_spans_sampled")
    }
    release_caches()
    want_exact = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicated_substring_spans(docs).collect()
    )
    release_caches()
    want_sampled = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in sampled_substring_spans(docs).collect()
    )
    release_caches()
    assert got["dup_spans"] == want_exact
    assert got["dup_spans_sampled"] == want_sampled
