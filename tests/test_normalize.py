"""Unicode normalization (operators.normalize.normalize_text_col):
form semantics vs CPython unicodedata, scrub options, NULLs, plan."""

from __future__ import annotations

import random
import unicodedata

import pytest
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.normalize import (
    normalize_text_col,
)


def _apply(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", normalize_text_col(**kw).alias("t")
        ).collect()
    }


def test_nfc_composes_decomposed_accents(spark):
    decomposed = "café über"
    out = _apply(spark, [decomposed])
    assert out[0] == "café über"
    assert len(out[0]) == len(decomposed) - 2


def test_nfc_leaves_ascii_and_is_idempotent(spark):
    texts = ["plain ascii text", "café über"]
    out = _apply(spark, texts)
    assert out[0] == texts[0]
    assert out[1] == texts[1]  # already NFC


def test_nfkc_folds_compatibility_forms(spark):
    # ligature fi, fullwidth A, superscript 2: NFKC folds, NFC keeps
    t = "ﬁle Ａ x²"
    nfc = _apply(spark, [t], form="NFC")[0]
    nfkc = _apply(spark, [t], form="NFKC")[0]
    assert nfc == t
    assert nfkc == "file A x2"


def test_strip_zero_width_and_controls(spark):
    t = "a​b‌c﻿d\x07e\rf\tg\nh"
    out = _apply(
        spark, [t], strip_zero_width=True, strip_controls=True
    )[0]
    assert out == "abcdef\tg\nh"  # tab and newline survive, \r dropped


def test_collapse_whitespace(spark):
    out = _apply(
        spark, ["  a \t b\n\nc  "], collapse_whitespace=True
    )[0]
    assert out == "a b c"


def test_null_passthrough(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", normalize_text_col().alias("t")
        ).collect()
    }
    assert got[0] is None and got[1] == "x"


def test_matches_unicodedata_on_random_combining_sequences(spark):
    rng = random.Random(99)
    base = "aeiounc"
    marks = ["̀", "́", "̂", "̃", "̈", "̊"]
    texts = [
        "".join(
            rng.choice(base) + (rng.choice(marks) if rng.random() < 0.5 else "")
            for _ in range(rng.randint(1, 30))
        )
        for _ in range(40)
    ]
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = _apply(spark, texts, form=form)
        for i, t in enumerate(texts):
            assert got[i] == unicodedata.normalize(form, t), (form, i)


def test_bad_form_rejected():
    with pytest.raises(ValueError, match="form must be one of"):
        normalize_text_col(form="NFX")


def test_scan_stage_plan(spark):
    df = spark.range(5).select(
        F.col("id").cast("string").alias("text")
    )
    out = df.select(normalize_text_col().alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
