"""Property-based operator invariants (hypothesis):

- exact-decimal money sums are partition-order independent and agree
  with an arbitrary-precision Python oracle (the invariant the whole
  decimal sweep rests on — double sums are NOT partition-invariant);
- the as-of join matches a brute-force per-row oracle on random data;
- blocked near-dup pairs are a subset of the exact pair set (precision
  1.0 by construction: every candidate is BLAS-verified).
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.relational import (
    asof_join,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.similarity import (
    embedding_near_dup_pairs,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
    dec_price,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# 2-dp money values, the domain the decimal(18,4) cast is exact on.
money = st.integers(min_value=-(10**7), max_value=10**7).map(lambda c: c / 100)


@settings(**_SETTINGS)
@given(st.lists(money, min_size=1, max_size=60), st.sampled_from([1, 3, 17]))
def test_decimal_sum_is_partition_invariant_and_exact(spark, values, parts):
    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(parts)
    got = df.agg(
        F.round(F.sum(dec_price("v")), 2).cast("double").alias("s")
    ).collect()[0]["s"]
    want = float(sum(Decimal(str(v)) for v in values).quantize(Decimal("0.01")))
    assert got == want, (got, want, parts)


ts_small = st.integers(min_value=0, max_value=50)


@settings(**_SETTINGS)
@given(
    st.lists(st.tuples(st.integers(0, 3), ts_small), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 3), ts_small), min_size=0, max_size=25),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid long, k long, ts long"
    )
    right = spark.createDataFrame(
        [(k, t) for k, t in rights], "k long, rts long"
    )
    got = {
        r["lid"]: r["rts_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["rts"]
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [rt for rk, rt in rights if rk == k and rt <= t]
        want = max(cands) if cands else None
        assert got.get(i) == want, (i, k, t, got.get(i), want)


vec = st.lists(
    st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
    min_size=8,
    max_size=8,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(vec, min_size=2, max_size=20))
def test_blocked_near_dup_is_subset_of_exact(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = 0.8
    blocked = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df, threshold=thr, strategy="blocked", dim=8, n_bits=2, n_tables=4
        ).collect()
    }
    M = np.array([v for _, v in rows], dtype=np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    sims = M @ M.T
    exact = {
        (a, b)
        for a in range(len(rows))
        for b in range(a + 1, len(rows))
        if sims[a, b] >= thr - 1e-9
    }
    stray = blocked - exact
    assert not stray, f"blocked produced non-exact pairs: {stray}"


# ---------------------------------------------------------------------------
# merge_into vs a dict model: for ANY base table and update sequence,
# table-scope upsert must equal "dict.update per batch, last version wins
# within a batch" — including keys that move partitions.
# ---------------------------------------------------------------------------

_mrow = st.tuples(
    st.integers(min_value=0, max_value=9),                     # key
    st.sampled_from(["2024-03-01", "2024-03-02", "2024-03-03"]),  # partition
    st.integers(min_value=0, max_value=999),                   # value
    st.integers(min_value=0, max_value=9),                     # version
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(_mrow, min_size=1, max_size=12, unique_by=lambda r: r[0]),
    batches=st.lists(
        # unique (key, version) per batch: a version TIE on the same key
        # resolves arbitrarily in the engine (row_number over equal
        # versions) but deterministically in the dict model
        st.lists(
            _mrow, min_size=1, max_size=6, unique_by=lambda r: (r[0], r[3])
        ),
        min_size=1,
        max_size=2,
    ),
)
def test_merge_matches_dict_model(spark, tmp_path_factory, base, batches):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.merge import (
        merge_into,
    )

    path = str(tmp_path_factory.mktemp("merge") / "t")
    schema = "event_id long, partition_date string, value long, version long"
    merge_into(spark, path, spark.createDataFrame(base, schema), ["event_id"])
    model = {k: (p, v, ver) for k, p, v, ver in base}
    for batch in batches:
        merge_into(
            spark,
            path,
            spark.createDataFrame(batch, schema),
            ["event_id"],
            version_col="version",
            scope="table",
        )
        best = {}
        for k, p, v, ver in batch:  # last-write-wins by version within batch
            if k not in best or ver > best[k][2]:
                best[k] = (p, v, ver)
        model.update(best)
    got = {
        r.event_id: (str(r.partition_date), r.value, r.version)
        for r in spark.read.parquet(path).collect()
    }
    assert got == model


# ---------------------------------------------------------------------------
# pack_sequences vs a pure-python cumsum model: for ANY corpus, pack id
# must equal floor(preceding per-shard token cumsum / budget) in
# (shard, doc_id) order.
# ---------------------------------------------------------------------------

_doc = st.tuples(
    st.integers(min_value=0, max_value=999),          # doc_id (uniquified)
    st.sampled_from(["a", "b", "c"]),                  # shard
    st.integers(min_value=0, max_value=12),            # token count
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=25, unique_by=lambda d: d[0]),
    budget=st.integers(min_value=1, max_value=30),
)
def test_pack_sequences_matches_cumsum_model(spark, docs, budget):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        pack_sequences,
    )

    rows = [(i, s, " ".join(["t"] * n) if n else "") for i, s, n in docs]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.pack_id)
        for r in pack_sequences(df, budget_tokens=budget).collect()
    }
    model = {}
    cum: dict[str, int] = {}
    for i, s, n in sorted(docs, key=lambda d: (d[1], d[0])):
        model[i] = (s, n, cum.get(s, 0) // budget)
        cum[s] = cum.get(s, 0) + n
    assert got == model


tok = st.sampled_from(["a", "b", "ab", "cat", "dog", "zz"])
docs_strategy = st.lists(
    st.lists(tok, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(**_SETTINGS)
@given(docs_strategy)
def test_bpe_pair_counts_matches_python_oracle(spark, texts):
    """Weighted char-pair counts agree with a direct Counter oracle
    (within-word repeats counted, single-char words contribute none)."""
    from collections import Counter

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["pair"]: (r["n_occ"], r["n_words"])
        for r in bpe_pair_counts(df).collect()
    }
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    occ: Counter = Counter()
    words_with: dict[str, set] = {}
    for w, c in wc.items():
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            occ[p] += c
            words_with.setdefault(p, set()).add(w)
    want = {p: (occ[p], len(words_with[p])) for p in occ}
    assert got == want


@settings(**_SETTINGS)
@given(docs_strategy, st.sampled_from([2, 3]))
def test_duplicated_spans_matches_python_oracle(spark, texts, n):
    """Cross-doc duplicated n-token windows agree with a brute-force
    oracle on random corpora."""
    from collections import Counter

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        duplicated_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["span"]: (r["n_docs"], r["n_occ"])
        for r in duplicated_spans(df, n=n).collect()
    }
    occ: Counter = Counter()
    docs_with: dict[str, set] = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        for j in range(len(toks) - n + 1):
            s = " ".join(toks[j : j + n])
            occ[s] += 1
            docs_with.setdefault(s, set()).add(i)
    want = {
        s: (len(docs_with[s]), occ[s])
        for s in occ
        if len(docs_with[s]) >= 2
    }
    assert got == want


@settings(**_SETTINGS)
@given(docs_strategy)
def test_tfidf_topk_matches_python_oracle(spark, texts):
    """Top-k tf/df terms per doc agree with a brute-force oracle using
    the same (score desc, term asc) tie-break."""
    from collections import Counter

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.textops import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in tfidf_top_terms(df, k=2).collect()
    }
    tf: dict[int, Counter] = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        if toks:
            tf[i] = Counter(toks)
    df_counts: Counter = Counter()
    for c in tf.values():
        for term in c:
            df_counts[term] += 1
    want = {}
    for i, c in tf.items():
        ranked = sorted(
            c.items(), key=lambda kv: (-kv[1] / df_counts[kv[0]], kv[0])
        )
        for rank, (term, _n) in enumerate(ranked[:2], start=1):
            want[(i, rank)] = term
    assert got == want


# hostname labels: lowercase alnum + dash, the realistic shapes plus
# degenerate ones (single label, empty labels from doubled dots arrive
# via the join below)
_label = st.text(alphabet="abcxyz019-", min_size=1, max_size=6)
_host = st.lists(_label, min_size=1, max_size=5).map(".".join)
_ip = st.tuples(*[st.integers(0, 255)] * 4).map(
    lambda t: ".".join(map(str, t))
)


def _ref_registered_domain(host: str) -> str:
    """Plain-Python reference of the bounded registrable-domain rule."""
    import re

    if re.fullmatch(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", host):
        return host
    labels = host.split(".")
    n = len(labels)
    multi = {"co", "com", "ac", "gov", "edu", "org", "net"}
    take = 3 if n >= 3 and labels[-2] in multi else min(n, 2)
    return ".".join(labels[-take:])


@settings(**_SETTINGS)
@given(st.lists(st.one_of(_host, _ip), min_size=1, max_size=30))
def test_registered_domain_matches_python_reference(spark, hosts):
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.urlops import (
        registered_domain_col,
    )

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["dom"]
        for r in df.select(
            "host", registered_domain_col(F.col("host")).alias("dom")
        ).collect()
    }
    for h in set(hosts):
        assert got[h] == _ref_registered_domain(h), (h, got[h])
