"""Gopher repetition rules (operators.textops.
with_gopher_repetition_flags): constructed per-rule violations, guard
semantics, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
    GOPHER_DUP_NGRAM_PCT,
    GOPHER_TOP_NGRAM_PCT,
    with_gopher_repetition_flags,
)


def _flags(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in with_gopher_repetition_flags(df).collect()
    }


def test_clean_prose_passes(spark):
    out = _flags(
        spark,
        [
            "the quick brown fox jumps over one lazy dog while another "
            "cat watches from a warm windowsill thinking about dinner "
            "and many other interesting things entirely",
        ],
    )
    assert out[0]["repetition_pass"] is True


def test_dup_lines_rules(spark):
    # 3 of 4 lines are the same long line -> both line rules fire
    t = "repeated line with plenty of characters\n" * 3 + "unique tail"
    out = _flags(spark, [t.rstrip("\n")])
    assert out[0]["fail_dup_lines"] is True
    assert out[0]["fail_dup_line_chars"] is True
    # distinct lines -> neither fires
    out2 = _flags(spark, ["alpha\nbeta\ngamma\ndelta"])
    assert out2[0]["fail_dup_lines"] is False
    assert out2[0]["fail_dup_line_chars"] is False


def test_top_ngram_coverage(spark):
    # "spam spam ... spam": every 2-gram is "spam spam"
    out = _flags(spark, ["spam " * 20])
    for n in GOPHER_TOP_NGRAM_PCT:
        assert out[0][f"fail_top_{n}gram"] is True, n
    assert out[0]["repetition_pass"] is False


def test_single_occurrence_top_ngram_is_not_repetition(spark):
    # short unrepeated doc: its top bigram covers >20% of the chars but
    # occurs ONCE -> must not fail (the maxc > 1 guard)
    out = _flags(spark, ["tiny unrepeated document"])
    for n in GOPHER_TOP_NGRAM_PCT:
        assert out[0][f"fail_top_{n}gram"] is False, n


def test_dup_long_ngram_coverage(spark):
    # a 10-token phrase repeated 3 times with unique filler between
    phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t = f"{phrase} x1 {phrase} y2 {phrase} z3"
    out = _flags(spark, [t])
    for n in GOPHER_DUP_NGRAM_PCT:
        assert out[0][f"fail_dup_{n}gram"] is True, n
    # the same tokens shuffled uniquely -> no repeated 5..10-grams
    out2 = _flags(
        spark,
        ["alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "x1 y2 z3 kappa iota theta eta zeta epsilon delta gamma"],
    )
    for n in GOPHER_DUP_NGRAM_PCT:
        assert out2[0][f"fail_dup_{n}gram"] is False, n


def test_short_and_empty_docs_pass(spark):
    out = _flags(spark, ["", "one", "two words"])
    for i in range(3):
        assert out[i]["repetition_pass"] is True, i


def test_passthrough_columns_and_plan(spark):
    df = spark.createDataFrame(
        [(0, "a b c", "s1")], "doc_id long, text string, source string"
    )
    out = with_gopher_repetition_flags(df)
    assert out.columns[:3] == ["doc_id", "text", "source"]
    n_flags = 2 + len(GOPHER_TOP_NGRAM_PCT) + len(GOPHER_DUP_NGRAM_PCT) + 1
    assert len(out.columns) == 3 + n_flags
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_run_fold_helpers_match_python_reference(spark):
    """Direct property check of the sorted run-length folds that
    replaced the O(m²) distinct×filter counts: on random string
    arrays, ``_run_fold_chars`` (dup-chars contribution) and
    ``_run_top_chars`` must equal a plain-Python Counter reference —
    including the lexicographic tie-break, the cnt>1 gates, and
    empty/singleton arrays."""
    import random
    from collections import Counter

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        _run_fold_chars,
        _run_top_chars,
    )

    rng = random.Random(42)
    vocab = ["a", "bb", "ccc", "dd x", "e", "ff", "über", ""]
    arrays = [[]] + [
        [rng.choice(vocab) for _ in range(rng.randrange(1, 30))]
        for _ in range(40)
    ]

    def ref_dup(arr):
        return sum(c * len(el) for el, c in Counter(arr).items() if c > 1)

    def ref_extra(arr):
        return sum((c - 1) * len(el) for el, c in Counter(arr).items() if c > 1)

    def ref_top(arr):
        if not arr:
            return 0
        cnt = Counter(arr)
        maxc = max(cnt.values())
        if maxc <= 1:
            return 0
        top = min(el for el, c in cnt.items() if c == maxc)
        return maxc * len(top)

    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)],
        "id long, arr array<string>",
    )
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            _run_fold_chars(
                F.col("arr"), lambda c, el: F.when(c > 1, c * F.length(el))
            ).alias("dup"),
            _run_fold_chars(
                F.col("arr"),
                lambda c, el: F.when(c > 1, (c - 1) * F.length(el)),
            ).alias("extra"),
            _run_top_chars(F.col("arr")).alias("top"),
        ).collect()
    }
    for i, arr in enumerate(arrays):
        assert got[i]["dup"] == ref_dup(arr), (i, arr)
        assert got[i]["extra"] == ref_extra(arr), (i, arr)
        assert got[i]["top"] == ref_top(arr), (i, arr)


def test_arrow_battery_matches_hof_twin(spark):
    """The Arrow default must equal the pure-JVM run-length-fold twin
    row-for-row on real corpus text (plus crafted edge docs): the
    outputs are exact integers/booleans, so ANY divergence is a
    semantics bug — tokenization (Java ASCII \\s vs Python Unicode),
    trim width, tie-breaks, or empty-doc handling."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        _with_gopher_repetition_flags_hof,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [
            (100001, ""),
            (100002, None),
            (100003, "  \t tab nbsp words \n\n line \n line \n"),
            (100004, "x y x y x y x y x y"),
            # non-ASCII case mappings (r11 advice): the Arrow path
            # lowercases with Python str.lower(), the twin with JVM
            # String.toLowerCase — these rows fail loudly if the two
            # ever diverge (e.g. a tr/az JVM default locale mapping
            # 'I' -> 'ı', or a Unicode-version skew in case tables)
            (100005, "İstanbul İSTANBUL istanbul I ı İ i̇"),
            (100006, "ΑΣ ΟΔΟΣ ΑΣ ΟΔΟΣ ΣΙΓΜΑ ας οδος"),
            (100007, "STRASSE ẞ ß strasse STRASSE ẞ"),
            (100008, "ǅungla ǄUNGLA ǆungla ǅungla LJ lj Ǆǅǆ"),
            (100009, "ⅫⅬ ⅻⅼ ⅫⅬ roman ﬁﬂ ﬁﬂ ligatures"),
        ],
        "doc_id long, text string",
    )
    base = docs.select("doc_id", "text").unionByName(edge)
    a = {
        r["doc_id"]: r
        for r in with_gopher_repetition_flags(base).collect()
    }
    b = {
        r["doc_id"]: r
        for r in _with_gopher_repetition_flags_hof(base).collect()
    }
    assert set(a) == set(b) and len(a) > 4
    for doc_id in a:
        ra, rb = a[doc_id].asDict(), b[doc_id].asDict()
        assert ra == rb, (doc_id, ra, rb)
