"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + noop-sink write). The
consumer is ``df.write.format("noop")`` — it forces FULL evaluation of
every output column. The previous ``.count()`` consumer let Catalyst
prune aggregate columns a count never needs, under-measuring exactly the
queries whose cost lives in the aggregates (the exact-decimal money
sums). For one transition round the JSON also carries the legacy
count-consumer timings ("count_consumer_*") so round-over-round
continuity against the r1–r3 numbers is explicit.

A warm-up pass at the TARGET SF first touches the JVM/codegen paths so
the timed numbers measure the queries, not session startup.

REQUIRED RUN ORDER vs the plan audit: scripts/audit_plan_shapes.py
stamps its artifact with the upcoming round = max(BENCH_r*.json) + 1 —
the same rule this script uses for BENCH_LOCAL_r{N}.json — so run the
audit BEFORE the driver's round-end bench capture records
BENCH_r{N}.json. An audit re-run after that capture would forward-date
its artifact to N+1 and this script's newest-artifact pick would
misattribute it to the next round (the audit's --round flag re-stamps
if that ever happens).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark import (
    get_spark_session,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    BENCH_EXTRA,
    QUERIES,
)

# Bench set resolves from the full catalog plus the performance-shaped
# bench-only variants (raw minhash pairs / simhash / multimodal features,
# whose correctness twins are the *_check queries in QUERIES).
ALL_QUERIES = {**QUERIES, **BENCH_EXTRA}

# Headline set: the flagship + the heavier relational/llm operators.
BENCH_QUERIES = [
    "q_billing_flagship_daily",
    "q_billing_sessionization",
    "q_rel_q1_pricing_summary",
    "q_rel_q3_top_orders",
    "q_rel_q5_nation_volume",
    "q_rel_q8_market_share",
    "q_rel_q21_sole_blame",
    "q_rel_brand_revenue",
    "q_rel_top3_parts_per_brand",
    "q_rel_running_totals",
    "q_rel_cube_lineitem",
    "q_rel_range_join",
    "q_rel_asof_join",
    "q_llm_dedup_exact",
    "q_llm_minhash_pairs",
    "q_llm_cosine_topk",
    "q_llm_embedding_near_dup",
    "q_llm_token_counts_bpe",
    "q_llm_multimodal_features",
    # real-codec twin: stdlib PNG encode+decode per document inside the
    # same Arrow plumbing — quantifies the Python codec boundary
    "q_llm_png_features",
    "q_llm_curation_pipeline",
    "q_llm_near_dup_pairs_blocked",
    "q_rel_q2_min_cost_supplier",
    "q_rel_q9_product_profit",
    "q_llm_contamination_probe",
    # skew-stress pair: same 30%-hot-key shuffle join, plain (AQE skew
    # split) vs explicitly salted — the salted operator's evidence row
    "q_rel_skew_join_plain",
    "q_rel_skew_join_salted",
    # round-4 operators: span-level dedup (token-window explode+agg),
    # BPE pair counts (word-frequency reduction), PQ ANN (ADC+rerank),
    # distributed k-means (4 Lloyd iterations, measured end-to-end)
    "q_llm_span_dedup",
    "q_llm_bpe_pairs",
    "q_llm_pq_topk",
    # r14: the LSH twin of pq_topk — timed for round-over-round
    # continuity on the gated candidate re-join (see SCALE_PROBE_OPS)
    "q_llm_lsh_topk",
    "q_llm_kmeans",
    # URL/domain curation: scan-stage domain extraction + blocklist
    # anti-join + per-domain cap (one shuffle on the domain key)
    "q_llm_domain_blocklist_cap",
    # serving-path ANN: search a standing IVFADC index (built once at
    # warm-up, reused) — partition-pruned probe + ADC + exact rerank
    "q_llm_ivfadc_search",
    # one-scan multi-distinct column profile: exact (Expand two-phase
    # agg, the data-quality surface's heaviest shape) vs HLL-approx
    # (no Expand — the 100 TB path), as a measured pair
    "q_rel_table_profile",
    "q_rel_table_profile_approx",
    # round-8 curation additions: Gopher rule gate (one codegen'd scan),
    # context-window chunking (explode+slice, zero shuffle), bigram-LM
    # scoring (pair-stream model joins — the heaviest new shape)
    "q_llm_gopher_rules",
    "q_llm_chunking",
    "q_llm_bigram_nll",
    # round-8 curation additions, second wave: per-site boilerplate
    # strip (hash-triple count + broadcast-back array filter), ECDF
    # rank fusion (3 distinct-value counts + broadcast joins), char
    # entropy (heaviest higher-order-function projection), Unicode NFC
    # (the Arrow UDF boundary), prototypicality (k ordered folds/row)
    "q_llm_boilerplate_strip",
    "q_llm_quality_rank_fuse",
    "q_llm_char_entropy",
    "q_llm_unicode_normalize",
    "q_llm_prototypicality",
    # the 13-rule array-lambda battery (heaviest scan-stage projection
    # in the catalog) and the fingerprint-join stitch detector
    "q_llm_gopher_repetition",
    "q_llm_stitched_pairs",
    # this round's additions: DSIR scoring (bounded hashed-ngram model
    # + broadcast score join — the heaviest new explode), BM25 search
    # (scan-stage term filter, only matched tokens shuffle), PageRank
    # (10 checkpointed keyed-agg rounds), PSI drift (two scans
    # collapsing to <=bins partials), JL projection (plan-literal
    # folds), weighted A-ES sampling (TakeOrdered over a scan key)
    "q_llm_dsir_scores",
    "q_llm_bm25_search",
    "q_rel_pagerank",
    "q_rel_psi_value_drift",
    "q_llm_jl_projection",
    "q_llm_weighted_sample",
]


def bench_ingest(spark, n_records: int = 150_000) -> dict:
    """Streaming-ingest throughput probe: N synthetic billing JSON lines
    (deterministic mix of the 4 msgTypes + rejects) drained through the
    full pipeline — parse-once, route, idempotent partitioned sinks,
    per-batch metrics — via availableNow. Reports end-to-end rows/sec,
    the number the reference's 4×-reparse foreachBatch directly hurts
    (BASELINE.md 'Ingest redundancy factor').

    Stability (r12 verdict task 3): parse_once_speedup wobbled 15%
    round-over-round on unchanged code at 50k rows / min-of-2 —
    single-shot streaming noise (BASELINE.md documents a 1.1–2.3×
    spread) dominates a ~2 s denominator. Now 150k rows (the ratio
    grows with batch size per the r11 artifact note: fixed per-batch
    costs amortize, leaving the 4× parse redundancy visible) and
    min-of-3 per shape; the batch size rides along in the payload so
    cross-round comparisons are explicitly like-for-like."""
    import json as _json
    import shutil
    import tempfile

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.stream import (
        billing_stream_source,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.streaming.pipeline import (
        BillingPipeline,
    )

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.parse import (
        parse_billing,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.route import (
        route,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.streaming.pipeline import (
        drain_available_now,
    )

    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        inp = os.path.join(tmp, "in")
        os.makedirs(inp)
        types = ["transfer", "request", "store", "remove", "mystery"]
        with open(os.path.join(inp, "events.json"), "w") as f:
            for i in range(n_records):
                day = i % 7 + 1
                f.write(
                    _json.dumps(
                        {
                            "msgType": types[i % len(types)],
                            "date": f"2024-03-0{day}T1{i % 10}:00:00.000+0000",
                            "cellName": f"pool-{i % 16}",
                            "fileSize": float(i),
                            "queuingTime": i % 100,
                            "status": {"msg": "ok", "code": 0},
                        }
                    )
                    + "\n"
                )
        # Reference-shape twin (`Dcache_kafka_to_hive.py:328-336`): each
        # route re-parses the batch from scratch — no persist, no
        # ledger, plain appends — so the parse-once win is a measured
        # ratio against the same input, not a claim in BASELINE.md.
        # Rejects are dropped, as the reference drops them.
        def ref_shape_batch(wh_dir):
            def _process(batch_df, batch_id):
                for name in ("transfers", "requests", "storage", "removes"):
                    reparsed = parse_billing(batch_df)  # the 4x redundancy
                    route(reparsed)[name].write.mode("append").partitionBy(
                        "partition_date"
                    ).parquet(os.path.join(wh_dir, name))

            return _process

        # Warm-up: drain a 200-row file through BOTH shapes untimed, so
        # the one-time streaming costs (file-source init, foreachBatch
        # Python callback setup, parquet committer classes) don't land
        # on whichever shape happens to run first — round 5's first cut
        # timed the pipeline cold and the twin warm, inverting the
        # ratio.
        # Warm-up drains the FULL input through BOTH shapes untimed
        # (fresh warehouse each): the r13 stability probe found the
        # 200-row warm-up left the first timed pass paying the cold
        # page-cache read of the real input file — one session's first
        # pipeline pass read 3.8 s where warm passes read 2.9 s,
        # enough to swing the ratio from 1.25 to 0.97 on its own.
        BillingPipeline(
            billing_stream_source(spark, "file", path=inp),
            os.path.join(tmp, "warm_wh"),
        ).run_available_now(os.path.join(tmp, "warm_ck"))
        drain_available_now(
            billing_stream_source(spark, "file", path=inp),
            ref_shape_batch(os.path.join(tmp, "warm_wh_ref")),
            os.path.join(tmp, "warm_ck_ref"),
        )

        # min of 3 runs per shape, INTERLEAVED (pipeline, ref,
        # pipeline, ref, …) with a fresh warehouse/checkpoint each:
        # single-shot streaming timings swing >2x from page-cache and
        # scheduler noise (round 5 measured a 1.1x..2.3x spread from
        # identical code; min-of-2 still let the ratio drift
        # 1.36→1.18 across r11/r12 — r12 verdict task 3). Interleaving
        # makes slow session drift (GC pressure, background load) land
        # on both shapes symmetrically instead of on whichever ran
        # second.
        dt = float("inf")
        ref_dt = float("inf")
        total = 0
        for rep in range(3):
            pipe = BillingPipeline(
                billing_stream_source(spark, "file", path=inp),
                os.path.join(tmp, f"wh{rep}"),
            )
            t0 = time.perf_counter()
            pipe.run_available_now(os.path.join(tmp, f"ck{rep}"))
            dt = min(dt, time.perf_counter() - t0)
            total = sum(m["total_rows"] for m in pipe.metrics())
            t0 = time.perf_counter()
            drain_available_now(
                billing_stream_source(spark, "file", path=inp),
                ref_shape_batch(os.path.join(tmp, f"wh_ref{rep}")),
                os.path.join(tmp, f"ck_ref{rep}"),
            )
            ref_dt = min(ref_dt, time.perf_counter() - t0)
        return {
            "rows": total,
            "batch_rows": n_records,
            "timing": (
                "min over 3 interleaved fresh-warehouse passes per "
                "shape, after a full-input warm-up of both shapes"
            ),
            "seconds": round(dt, 3),
            "rows_per_sec": round(total / dt, 1),
            "reference_shape_seconds": round(ref_dt, 3),
            "reference_shape_rows_per_sec": round(total / ref_dt, 1),
            "parse_once_speedup": round(ref_dt / dt, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SCALE_PROBE_OPS = {
    # op -> table it scans (the one the probe replicates)
    "q_llm_span_dedup": "documents",
    "q_llm_minhash_pairs": "documents",
    "q_llm_kmeans": "embeddings",
    "q_llm_pq_topk": "embeddings",
    "q_rel_table_profile": "lineitem",
    "q_rel_table_profile_approx": "lineitem",
    # the two priciest plans in the suite (bench #1/#2 by wall time) —
    # both single codegen'd scan-stage projections, in the probe so the
    # "heavy constant x linear scan" claim is measured, not asserted
    "q_llm_gopher_repetition": "documents",
    "q_llm_char_entropy": "documents",
    # r12: the two remaining load-bearing scale claims without measured
    # growth points — DSIR's "B-bounded model, corpus-linear stream"
    # (three featurize passes, model groupBys capped at n_buckets rows)
    # and IVFADC's "partition-pruned serving scan" (the path the
    # pq_topk growth note punts to; its index build happens in the
    # untimed builder call, so the row times the SEARCH, which is the
    # serving claim)
    "q_llm_dsir_scores": "documents",
    "q_llm_ivfadc_search": "embeddings",
    # r14 (r13 verdict task 3): the LSH candidate re-join was fixed in
    # r13 (broadcast hint) and gated in r14 (threshold fallback) — its
    # growth point is measured here like pq_topk's, the same evidence
    # standard as its siblings
    "q_llm_lsh_topk": "embeddings",
}


def bench_scale_probe(spark, sf_dir: str, factor: int = 10) -> dict:
    """Shuffle-GROWTH probe: run the heaviest operators at 1× and
    ``factor``× the corpus and record wall-time AND shuffled-byte
    ratios — the measured curve behind every "scales to 100 TB" claim
    (a plan that looks right can still grow super-linearly; this is
    the artifact that shows whether it does).

    Replication is id-offset + CONTENT-PERTURBED so the blow-up the
    probe measures is data growth, not artificial duplication:

    - documents: replica k's text goes through a BIJECTIVE character
      substitution (Caesar rotation by k over a-z/A-Z). A bijection on
      characters maps each doc's shingle/token-window set bijectively,
      so every replica preserves the corpus' internal similarity
      structure EXACTLY (per-replica LSH pairs = the 1x count — an
      additive-token perturbation was measured inflating char-trigram
      Jaccard ~19x by flooding docs with the shared suffix trigrams),
      while any letter-bearing shingle differs across replicas, keeping
      copies near-dup-disjoint (10 identical copies would put every doc
      in a 10-member bucket and measure the k² pair explosion, not
      scaling). Digit-only windows survive rotation unchanged —
      negligible at shingle_n=3 / n=8 windows;
    - embeddings: deterministic per-replica jitter keeps the geometry
      from collapsing onto coincident points;
    - lineitem: key-offset copies (value distributions preserved).

    Both scales are written fresh to a temp dir (same file layout, so
    1× isn't advantaged by the original's packing), timed min-of-2
    after a warm-up.

    The window is CONSTRUCTION + execution, and shuffle bytes are the
    executor-cumulative total-shuffle-write DELTA across that window
    (r14 review): operators with eager subtrees — the LSH gate
    materializes and counts its candidate-pair set at DataFrame-
    construction time — do corpus work and corpus shuffles in jobs the
    old scheme (construct before t0, read the final plan's SQLMetrics)
    never saw, so their growth curves read falsely flat. The delta
    also folds in broadcast-build and subquery jobs; for purely lazy
    ops it matches the old plan-walk number (the probe session runs
    nothing else), so pre-r14 rows stay comparable.
    """
    import shutil
    import tempfile

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="bench_scale_")
    out: dict[str, dict] = {}
    try:
        dirs = {1: os.path.join(tmp, "x1"), factor: os.path.join(tmp, "x10")}
        for d in dirs.values():
            os.makedirs(d)
        for table in sorted(set(SCALE_PROBE_OPS.values())):
            base = load_table(spark, sf_dir, table)
            id_col = {"documents": "doc_id", "embeddings": "vec_id",
                      "lineitem": "l_orderkey"}[table]
            offset = 100_000_000
            for mult, d in dirs.items():
                reps = []
                for k in range(mult):
                    r = base.withColumn(
                        id_col, F.col(id_col) + F.lit(k * offset)
                    )
                    if k and table == "documents":
                        # compose letter(26) x digit(10) rotations: the
                        # substitution stays bijective per replica, but
                        # replica classes now repeat at lcm(26,10)=130
                        # instead of 26 — at factor=100 a pure Caesar
                        # rotation made replicas 26 apart EXACT copies,
                        # and the measured "growth" was the k-squared
                        # duplicate-pair explosion of artificial
                        # duplication, not data scaling
                        lower = "abcdefghijklmnopqrstuvwxyz"
                        digits = "0123456789"
                        rot = lower[k % 26 :] + lower[: k % 26]
                        rotd = digits[k % 10 :] + digits[: k % 10]
                        r = r.withColumn(
                            "text",
                            F.translate(
                                "text",
                                lower + lower.upper() + digits,
                                rot + rot.upper() + rotd,
                            ),
                        )
                    if k and table == "embeddings":
                        r = r.withColumn(
                            "embedding",
                            F.expr(
                                f"transform(embedding, (x, i) -> x + "
                                f"{k} * 0.003 * (pmod(hash(vec_id, i), 11) - 5))"
                            ),
                        )
                    reps.append(r)
                frame = reps[0]
                for r in reps[1:]:
                    frame = frame.unionByName(r)
                frame.write.mode("overwrite").parquet(
                    os.path.join(d, f"{table}.parquet")
                )
        def _drain_and_total_shuffle() -> int:
            # executor-cumulative shuffle-write bytes, after draining
            # the listener bus so the status store has processed every
            # completed job in the window (metrics land asynchronously).
            # The whole read chain uses private Spark internals via
            # _jsc — if a Spark upgrade moves them, return the -1
            # sentinel so the probe still records TIMINGS and only the
            # shuffle column degrades (r15 advice: a rename here used
            # to crash the entire scale probe mid-bench).
            sc = spark.sparkContext
            try:
                sc._jsc.sc().listenerBus().waitUntilEmpty()
            except Exception:  # noqa: BLE001 — drain is best-effort
                pass
            try:
                total = 0
                it = sc._jsc.sc().statusStore().executorList(False).iterator()
                while it.hasNext():
                    total += it.next().totalShuffleWrite()
                return total
            except Exception:  # noqa: BLE001 — internals moved
                return -1

        for op in SCALE_PROBE_OPS:
            if op not in ALL_QUERIES:
                continue
            row: dict[str, float] = {}
            try:
                for mult, d in dirs.items():
                    best, shuffled = float("inf"), 0
                    for _rep in range(2):
                        s0 = _drain_and_total_shuffle()
                        t0 = time.perf_counter()
                        # construction INSIDE the window: an operator
                        # with an eager subtree (the LSH gate's
                        # materialize+count) does corpus work at
                        # construction time, and that work is part of
                        # the growth curve under measurement
                        df = ALL_QUERIES[op](spark, d)
                        # drive THIS frame's execution (a noop write
                        # compiles a separate QueryExecution)
                        df._jdf.queryExecution().toRdd().count()
                        dt = time.perf_counter() - t0
                        s1 = _drain_and_total_shuffle()
                        if dt < best:
                            best = dt
                            # -1 sentinel from either read → the delta
                            # is meaningless; surface -1 in the row
                            shuffled = (
                                s1 - s0 if s0 >= 0 and s1 >= 0 else -1
                            )
                    tag = "1" if mult == 1 else str(mult)
                    row[f"t{tag}"] = round(best, 3)
                    row[f"shuffle{tag}"] = shuffled
                f = str(factor)
                if row.get("t1"):
                    row["t_ratio"] = round(row[f"t{f}"] / row["t1"], 2)
                if row.get("shuffle1", 0) > 0 and row.get(f"shuffle{f}", -1) >= 0:
                    row["shuffle_ratio"] = round(
                        row[f"shuffle{f}"] / row["shuffle1"], 2
                    )
                out[op] = row
            except Exception as exc:  # noqa: BLE001 — isolate per op
                out[op] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        try:
            out["q_llm_crawl_extract"] = _crawl_probe_row(
                spark, sf_dir, tmp, factor
            )
        except Exception as exc:  # noqa: BLE001 — isolate per op
            out["q_llm_crawl_extract"] = {
                "error": f"{type(exc).__name__}: {exc}"[:200]
            }
        out["_factor"] = factor
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _crawl_probe_row(spark, sf_dir: str, tmp: str, factor: int) -> dict:
    """Scale row for the crawl path (read_warc → HTTP envelope decode →
    HTML extract) — the heaviest per-row Python work in the repo. Its
    parallel grain is FILE count (binaryFile assigns one task per
    .warc.gz), not row groups, so the generic table-replication probe
    above measures the wrong thing for it: 10× docs in ONE archive is
    one 10×-longer task. The claim to verify is that wall time grows by
    task WAVES — ceil(files / cores) — while per-file cost stays flat:
    1× = 8 archives (a quarter of the 32 local cores), factor× = 8·factor
    archives, so the ideal wall ratio at 10× is ceil(80/32) = 3, far
    below the 10× data growth. Archives are byte-identical replicas:
    extraction is per-record with no cross-record interaction, so
    duplication cannot distort the measurement the way it would for the
    dedup/similarity ops above (their replication is content-perturbed
    for exactly that reason)."""
    import gzip

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.html import (
        extract_text,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.metrics import (
        collect_plan_metrics,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.tables import (
        load_table,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.sources.warc import (
        decode_response_html,
        read_warc,
        write_warc_bytes,
    )
    from pyspark.sql import functions as F

    # bounded driver read (r11 advice): the probe's shard design is a
    # fixed 8 archives regardless of corpus size, so cap the synthesis
    # input instead of collecting an arbitrarily large documents table
    # to the driver if the probe is ever pointed at a big sf_dir; the
    # orderBy makes the cap deterministic (TakeOrdered, not first-N).
    docs = sorted(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(8192)
        .collect(),
        key=lambda r: r.doc_id,
    )

    def envelope(doc_id: int, body: bytes) -> bytes:
        # same transfer-mode rotation as the q_llm_crawl_extract gate,
        # so the probe times the real decode mix (gunzip + de-chunk)
        mode = doc_id % 3
        if mode == 0:
            return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        if mode == 1:
            return (
                b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
                + gzip.compress(body)
            )
        cut = max(1, len(body) // 3)
        a, b = body[:cut], body[cut:]
        return (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            + f"{len(a):x}".encode() + b"\r\n" + a + b"\r\n"
            + f"{len(b):x}".encode() + b"\r\n" + b + b"\r\n0\r\n\r\n"
        )

    n_base = 8
    shards: list[list[bytes]] = [[] for _ in range(n_base)]
    for i, r in enumerate(docs):
        body = (
            f"<html><head><title>skip</title></head><body><h1>Doc "
            f"{r.doc_id}</h1><p>{r.text or ''} &amp; more</p></body></html>"
        ).encode("utf-8")
        shards[i % n_base].append(
            gzip.compress(
                write_warc_bytes(
                    [
                        {
                            "warc_type": "response",
                            "target_uri": f"urn:doc:{r.doc_id}",
                            "content": envelope(r.doc_id, body),
                            "content_type": "application/http;msgtype=response",
                        }
                    ]
                )
            )
        )
    shard_bytes = [b"".join(s) for s in shards]

    dirs = {1: os.path.join(tmp, "crawl_x1"), factor: os.path.join(tmp, "crawl_xN")}
    for mult, d in dirs.items():
        os.makedirs(d)
        for rep in range(mult):
            for i, payload in enumerate(shard_bytes):
                with open(
                    os.path.join(d, f"crawl-{rep:02d}-{i:02d}.warc.gz"), "wb"
                ) as f:
                    f.write(payload)

    def run_once(d: str):
        recs = read_warc(spark, d, record_types=("response",))
        extracted = extract_text(
            decode_response_html(recs, "content", "html"), "html", "text"
        )
        df = extracted.agg(
            F.count("*").alias("n"),
            F.sum(F.length("text")).alias("chars"),
        )
        t0 = time.perf_counter()
        df._jdf.queryExecution().toRdd().count()
        return time.perf_counter() - t0, df

    # untimed warm-up over BOTH dirs: the first crawl pass pays
    # Python-worker spawn + codec JIT, and the big point schedules ~3×
    # more concurrent workers than the 1× point, so each needs its own
    # warm pass. At a ~0.5 s denominator the cold start made same-code
    # probe runs read 8.2× vs 15.0× (r11 verdict task: stabilize the
    # probe); warmed + min-of-3 on both points, consecutive full probe
    # runs measured within 1.3× on every crawl field.
    run_once(dirs[factor])
    run_once(dirs[1])
    row: dict[str, float] = {}
    for mult, d in dirs.items():
        best, best_df = float("inf"), None
        for _rep in range(3):
            dt, df = run_once(d)
            if dt < best:
                best, best_df = dt, df
        tag = "1" if mult == 1 else str(mult)
        row[f"t{tag}"] = round(best, 3)
        row[f"shuffle{tag}"] = collect_plan_metrics(best_df).get(
            "shuffle_bytes_written", 0
        )
        row[f"files{tag}"] = n_base * mult
    if row.get("t1"):
        row["t_ratio"] = round(row[f"t{factor}"] / row["t1"], 2)
    if row.get("shuffle1"):
        row["shuffle_ratio"] = round(row[f"shuffle{factor}"] / row["shuffle1"], 2)
    return row


def calibrate(spark) -> float:
    """Host-speed probe: a fixed pure-CPU codegen pipeline (no I/O, no
    shuffle read) timed min-of-3. Round-over-round query timings are
    only comparable modulo the host the round happens to run on —
    round 4's box measured ~1.6× slower per core than round 3's on
    byte-identical queries — so the payload carries this number and
    comparisons should use query_sec / calibration_sec."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        # xor-fold, not sum: summing the longs overflows BIGINT under
        # ANSI mode (a sum here DNF'd an entire bench run). 1B rows ≈
        # 0.5-1 s — large enough that scheduler noise doesn't dominate
        # the signal the way a 0.1 s probe's did.
        spark.range(1_000_000_000).selectExpr("xxhash64(id) AS h").selectExpr(
            "bit_xor(h) AS x"
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def consume(df) -> None:
    """Force FULL evaluation of every output column: the noop sink runs
    the whole plan and discards rows. ``count()`` would let Catalyst
    drop aggregate columns (a count needs no values), under-measuring
    aggregate-heavy queries."""
    df.write.format("noop").mode("overwrite").save()


def consume_count(df) -> None:
    """Legacy r1–r3 consumer, kept one transition round for
    round-over-round continuity reporting."""
    df.count()


def _git_head() -> str | None:
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=str(Path(__file__).resolve().parent),
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001 — no git in some driver sandboxes
        return None


def _code_changed_since(ref: str, extra_paths: tuple[str, ...] = ()) -> bool:
    """True when the PACKAGE or the entry/oracle surface (plus any
    ``extra_paths`` the caller's artifact also depends on — e.g. the
    plan-audit allowlist script) changed between ``ref`` and HEAD
    (uncommitted changes included). Unknown ref → True (fail toward
    flagging)."""
    import subprocess

    repo = Path(__file__).resolve().parent
    pkg = "development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark"
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", ref, "--",
             pkg, "__spark_entry__.py", "tests/oracle_harness.py",
             *extra_paths],
            capture_output=True, text=True, timeout=10, cwd=str(repo),
        )
        if out.returncode != 0:
            return True
        return bool(out.stdout.strip())
    except Exception:  # noqa: BLE001
        return True


def _plans_md_stale() -> str | None:
    """Flag a PLANS.md that predates the current package code — a stale
    committed plan audit claims plan shapes the current code may not
    produce. Standing round step: ``python scripts/gen_plans.py``.

    Preferred signal: the ``Generated at commit <head>`` stamp
    gen_plans.py writes into the header, checked with the same
    code-changed-since logic as the parity/vanilla artifacts (the
    commit-timestamp fallback below can false-positive when a
    regeneration is byte-identical — the measured lines are
    deterministic SQLMetrics — and therefore never needs a commit)."""
    import re
    import subprocess

    repo = Path(__file__).resolve().parent
    pkg = "development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark"
    try:
        with open(repo / "PLANS.md", encoding="utf-8") as f:
            head_block = f.read(500)
        m = re.search(r"Generated at commit ([0-9a-f]{6,40})\b", head_block)
    except OSError:
        m = None
    if m:
        if _code_changed_since(m.group(1)):
            return (
                f"PLANS.md generated at {m.group(1)}, package code changed "
                "since — regenerate with scripts/gen_plans.py"
            )
        return None
    try:
        t_pkg = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", pkg],
            capture_output=True, text=True, timeout=10, cwd=str(repo),
        ).stdout.strip()
        t_plans = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", "PLANS.md"],
            capture_output=True, text=True, timeout=10, cwd=str(repo),
        ).stdout.strip()
    except Exception:  # noqa: BLE001
        return None
    if not t_pkg or not t_plans:
        return None
    if int(t_plans) < int(t_pkg):
        return (
            "PLANS.md last committed before the newest package change — "
            "regenerate with scripts/gen_plans.py"
        )
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark_session(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    # Warm-up: run EVERY bench query once at the TARGET SF so codegen
    # JIT, the Python-worker pool (mapInPandas forks 1 worker/core on
    # first use, ~10 s), and the OS page cache for the input parquet
    # (cold VM disk reads dominate first touch: 26 s vs 3.4 s for the
    # same query) are all paid before timing — the timed numbers measure
    # steady-state query compute, as on a warm cluster.
    # Failure isolation: one broken query must never zero the round's
    # whole perf signal (round 2: a single plan-time AnalysisException in
    # warm-up DNF'd the entire benchmark). Each query is wrapped; broken
    # ones are reported in "errors" with the exception head (class +
    # first message line — the diagnosis, not the plan dump) and skipped
    # from the timed passes; the JSON line still prints.
    errors: dict[str, str] = {}

    def _err_head(exc: Exception) -> str:
        head = f"{type(exc).__name__}: {exc}".split("\n")
        return " ".join(head[:2])[:300]

    runnable = []
    for name in BENCH_QUERIES:
        try:
            consume(ALL_QUERIES[name](spark, sf_dir))
            runnable.append(name)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            errors[name] = _err_head(exc)
            print(f"  warmup FAILED {name}: {errors[name]}", file=sys.stderr)

    # Three timed passes, min per query: single-shot numbers on a shared
    # box swing up to 10x from GC/VM noise and page-cache eviction (a
    # 3.0s query has measured 36s when the host stalls mid-pass); the
    # min approximates steady-state per-query latency (what a warm
    # cluster would sustain).
    def timed_passes(
        sink, tag: str, names: list[str], errs: dict[str, str]
    ) -> dict[str, float]:
        timings: dict[str, float] = {}
        alive = list(names)
        for _pass in range(3):
            for name in list(alive):
                t0 = time.perf_counter()
                try:
                    sink(ALL_QUERIES[name](spark, sf_dir))
                except Exception as exc:  # noqa: BLE001
                    errs[name] = _err_head(exc)
                    # a query that fails in ANY pass is failed, period:
                    # drop its stale min so errors and timings stay
                    # disjoint (a query must not count as both timed
                    # and broken in the same payload)
                    timings.pop(name, None)
                    alive.remove(name)
                    print(
                        f"  {tag} pass{_pass} FAILED {name}: {errs[name]}",
                        file=sys.stderr,
                    )
                    continue
                dt = round(time.perf_counter() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
                print(f"  {tag} pass{_pass} {name}: {dt}s", file=sys.stderr)
        return timings

    timings = timed_passes(consume, "noop", runnable, errors)
    # transition-round continuity: the legacy count-consumer numbers the
    # r1 BASELINE.md totals were measured with (one extra pass set; the
    # page cache is already warm so the delta is pure consumer effect).
    # Count-pass failures stay out of the primary errors channel — a
    # query is "broken" iff its REAL (noop) run fails.
    count_errors: dict[str, str] = {}
    count_runnable = [n for n in runnable if n not in errors]
    count_timings = timed_passes(
        consume_count, "count", count_runnable, count_errors
    )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "catalog_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "consumer": "noop-write (full evaluation of every output column)",
        # legibility: the r10 verdict mis-read the per-query numbers as
        # single-shot; the loop has been min-of-N timed passes since r8
        "timing": "min over 3 timed passes per query, after a full warm-up pass",
        "count_consumer_total": round(sum(count_timings.values()), 3),
        "count_consumer_queries": count_timings,
    }
    try:
        payload["host_calibration_sec"] = calibrate(spark)
    except Exception as exc:  # noqa: BLE001 — the probe must not DNF the bench
        errors["_calibration"] = _err_head(exc)
    try:
        payload["ingest"] = bench_ingest(spark)
    except Exception as exc:  # noqa: BLE001 — the probe must not DNF the bench
        errors["_ingest_bench"] = _err_head(exc)
    try:
        payload["scale_probe"] = bench_scale_probe(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — the probe must not DNF the bench
        errors["_scale_probe"] = _err_head(exc)
    # standing sf0.1 full-parity sweep: scripts/run_sf01_parity.py writes
    # the artifact each round (idle box — running 129 oracle comparisons
    # inside the bench would double its wall time and contend with the
    # timed passes); the bench line carries the verdict + artifact path
    try:
        par = json.loads((Path(__file__).resolve().parent / "PARITY_SF01.json").read_text())
        payload["sf01_parity"] = {
            "n": par.get("n"), "fail": par.get("fail"),
            "git": par.get("git_head"), "artifact": "PARITY_SF01.json",
        }
        head = _git_head()
        if par.get("dirty"):
            # a sweep over uncommitted package code claims a commit it
            # didn't test — same staleness class as code-moved-since
            errors["_sf01_parity_dirty"] = (
                "PARITY_SF01.json was generated with uncommitted package "
                "changes — commit, then re-run scripts/run_sf01_parity.py"
            )
        elif (
            head
            and par.get("git_head")
            and head != par.get("git_head")
            and _code_changed_since(par["git_head"])
        ):
            # a sweep that predates CODE changes must never masquerade
            # as current — surface it as a bench error, not a silent
            # echo. (Artifact/doc-only commits after the sweep — e.g.
            # committing PARITY_SF01.json itself moves HEAD — don't
            # invalidate it.)
            errors["_sf01_parity_stale"] = (
                f"PARITY_SF01.json is from {par.get('git_head')}, "
                f"package code changed since — re-run "
                f"scripts/run_sf01_parity.py"
            )
    except OSError:
        pass
    except Exception as exc:  # noqa: BLE001
        errors["_sf01_parity"] = _err_head(exc)
    try:
        stale = _plans_md_stale()
        if stale:
            errors["_plans_md_stale"] = stale
    except Exception:  # noqa: BLE001 — advisory only
        pass
    # vanilla-session gate sweep (scripts/run_vanilla_gates.py, also
    # subprocess-run by tests/test_vanilla_session.py): the r8 failure
    # class was factory-conf-masked bugs, so a round whose *_check gates
    # never ran in a default-conf session at current code is flagged
    try:
        van = json.loads((Path(__file__).resolve().parent / "VANILLA_GATES.json").read_text())
        payload["vanilla_gates"] = {
            "n": van.get("n"), "fail": van.get("fail"),
            "git": van.get("git_head"), "artifact": "VANILLA_GATES.json",
        }
        head = _git_head()
        if van.get("fail"):
            errors["_vanilla_gates_red"] = (
                f"VANILLA_GATES.json records {van['fail']} failing gate(s)"
            )
        elif van.get("dirty"):
            errors["_vanilla_gates_dirty"] = (
                "VANILLA_GATES.json was generated with uncommitted package "
                "changes — commit, then re-run scripts/run_vanilla_gates.py"
            )
        elif (
            head
            and van.get("git_head")
            and head != van.get("git_head")
            and _code_changed_since(van["git_head"])
        ):
            errors["_vanilla_gates_stale"] = (
                f"VANILLA_GATES.json is from {van.get('git_head')}, "
                f"package code changed since — re-run "
                f"scripts/run_vanilla_gates.py"
            )
    except OSError:
        errors["_vanilla_gates_missing"] = (
            "VANILLA_GATES.json absent — run scripts/run_vanilla_gates.py "
            "(or pytest tests/test_vanilla_session.py)"
        )
    except Exception as exc:  # noqa: BLE001
        errors["_vanilla_gates"] = _err_head(exc)
    # standing whole-catalog plan-shape audit (r12 verdict task 4):
    # scripts/audit_plan_shapes.py triages every query's final adaptive
    # plan for AQE-masked scale-defect signatures against its
    # KNOWN_BENIGN allowlist and writes PLAN_AUDIT_r{N}.json; the bench
    # line carries the counts and flags a red or stale artifact so the
    # next masked defect is caught by artifact diff.
    try:
        audits = sorted(
            (
                int(p.stem.split("_r")[1]), p)
            for p in Path(__file__).resolve().parent.glob("PLAN_AUDIT_r*.json")
            if p.stem.split("_r")[1].isdigit()
        )
        if not audits:
            raise OSError("no PLAN_AUDIT_r*.json")
        aud = json.loads(audits[-1][1].read_text())
        payload["plan_audit"] = {
            "n_queries": aud.get("n_queries"),
            "n_flagged": aud.get("n_flagged"),
            "new_hits": len(aud.get("new_hits") or {}),
            "errors": len(aud.get("errors") or {}),
            "git": aud.get("git_head"),
            "artifact": audits[-1][1].name,
        }
        # the standing sf0.1 leg (r13 verdict task 5): carry its counts
        # beside the primary's, and red includes it — a plan flip that
        # only shows one scale up must fail the same artifact check
        leg = aud.get("sf0.1")
        if isinstance(leg, dict):
            payload["plan_audit"]["sf0.1"] = {
                "n_flagged": leg.get("n_flagged"),
                "new_hits": len(leg.get("new_hits") or {}),
                "errors": len(leg.get("errors") or {}),
            }
        head = _git_head()
        leg_red = isinstance(leg, dict) and (
            leg.get("new_hits") or leg.get("errors")
        )
        if aud.get("new_hits") or aud.get("errors") or leg_red:
            errors["_plan_audit_red"] = (
                f"{audits[-1][1].name} records unlisted plan-shape hits "
                "or errors — triage (scripts/audit_plan_shapes.py docstring)"
            )
        elif audits[-1][0] >= 14 and not isinstance(leg, dict):
            # the leg is STANDING from r14 on — a missing section must
            # not be indistinguishable from a green one (r14 review: a
            # --single-sf artifact silently dropped the size-threshold
            # flip guard from this gate)
            errors["_plan_audit_no_sf01_leg"] = (
                f"{audits[-1][1].name} lacks the standing sf0.1 leg — "
                "re-run scripts/audit_plan_shapes.py without --single-sf"
            )
        elif aud.get("dirty"):
            errors["_plan_audit_dirty"] = (
                f"{audits[-1][1].name} was generated with uncommitted "
                "package changes — commit, then re-run "
                "scripts/audit_plan_shapes.py"
            )
        elif (
            head
            and aud.get("git_head")
            and head != aud.get("git_head")
            and _code_changed_since(
                aud["git_head"], ("scripts/audit_plan_shapes.py",)
            )
        ):
            errors["_plan_audit_stale"] = (
                f"{audits[-1][1].name} is from {aud.get('git_head')}, "
                f"package code changed since — re-run "
                f"scripts/audit_plan_shapes.py"
            )
    except OSError:
        errors["_plan_audit_missing"] = (
            "PLAN_AUDIT_r*.json absent — run scripts/audit_plan_shapes.py"
        )
    except Exception as exc:  # noqa: BLE001
        errors["_plan_audit"] = _err_head(exc)
    # plan-edit-aware rotation guard: QUERY_HASHES.json must match the
    # live catalog content hashes. Drift is self-correcting (drifted
    # queries rank as unverified and lead every window until re-greened)
    # but wastes driver slots re-checking the same names round after
    # round — so a round that ends without regenerating the snapshot is
    # flagged the same way as a stale parity sweep.
    try:
        qh = json.loads((Path(__file__).resolve().parent / "QUERY_HASHES.json").read_text())
        recorded = {
            q: v.get("hash") for q, v in (qh.get("hashes") or {}).items()
        }
        from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (  # noqa: E501
            _QUERY_HASHES,
        )
        drift = sorted(
            q for q, h in _QUERY_HASHES.items() if recorded.get(q) != h
        )
        payload["query_hashes"] = {
            "n": len(recorded),
            "drift": len(drift),
            "git": qh.get("git_head"),
            "artifact": "QUERY_HASHES.json",
        }
        if drift:
            errors["_query_hashes_stale"] = (
                f"{len(drift)} quer{'y' if len(drift) == 1 else 'ies'} "
                f"edited since QUERY_HASHES.json ({', '.join(drift[:8])}"
                f"{', …' if len(drift) > 8 else ''}) — re-run "
                f"scripts/gen_query_hashes.py"
            )
    except OSError:
        errors["_query_hashes_missing"] = (
            "QUERY_HASHES.json absent — run scripts/gen_query_hashes.py"
        )
    except Exception as exc:  # noqa: BLE001
        errors["_query_hashes"] = _err_head(exc)
    if errors:
        payload["errors"] = errors
    if count_errors:
        payload["count_consumer_errors"] = count_errors

    # The driver captures only the tail of stdout, and the full payload
    # (30+ noop timings + 30+ count timings + ingest) overflows it —
    # rounds 2 and 4 shipped with BENCH_r{N}.json "parsed: null". So:
    # write the COMPLETE payload to a repo file, and print a compact
    # (≤1.5 KB) summary as the LAST stdout line for the driver to parse.
    repo = Path(__file__).resolve().parent
    prior = [
        int(p.stem.split("_r")[1])
        for p in repo.glob("BENCH_r*.json")
        if p.stem.split("_r")[1].isdigit()
    ]
    rnd = max(prior, default=0) + 1
    local_path = repo / f"BENCH_LOCAL_r{rnd:02d}.json"
    try:
        local_path.write_text(json.dumps(payload, indent=2, sort_keys=True))
    except OSError as exc:
        errors["_local_payload"] = _err_head(exc)

    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    summary = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
        "consumer": "noop-write",
        "n_queries": len(timings),
        "queries": top10,  # top-10 by runtime; full set in full_payload
        "count_consumer_total": payload["count_consumer_total"],
        "ingest": payload.get("ingest"),
        "n_errors": len(errors) + len(count_errors),
        "full_payload": str(local_path),
    }
    if "host_calibration_sec" in payload:
        summary["host_calibration_sec"] = payload["host_calibration_sec"]
    if "sf01_parity" in payload:
        summary["sf01_parity"] = {
            "n": payload["sf01_parity"].get("n"),
            "fail": payload["sf01_parity"].get("fail"),
            "git": payload["sf01_parity"].get("git"),
        }
    if "plan_audit" in payload:
        summary["plan_audit"] = {
            "n": payload["plan_audit"].get("n_queries"),
            "flagged": payload["plan_audit"].get("n_flagged"),
            "new": payload["plan_audit"].get("new_hits"),
            "err": payload["plan_audit"].get("errors"),
        }
        if "sf0.1" in payload["plan_audit"]:
            leg = payload["plan_audit"]["sf0.1"]
            summary["plan_audit"]["sf01"] = {
                "flagged": leg.get("n_flagged"),
                "new": leg.get("new_hits"),
                "err": leg.get("errors"),
            }
    if "scale_probe" in payload:
        # ratios only (full per-op times/bytes live in the local payload)
        sp = payload["scale_probe"]
        summary["scale_probe"] = {
            "factor": sp.get("_factor"),
            **{
                op: {"t": r.get("t_ratio"), "sh": r.get("shuffle_ratio")}
                for op, r in sp.items()
                if isinstance(r, dict) and "error" not in r
            },
        }
    line = json.dumps(summary)
    if len(line) > 1500:  # hard driver-capture budget: shed detail, keep totals
        summary.pop("queries", None)
        line = json.dumps(summary)
    if len(line) > 1500:
        summary.pop("scale_probe", None)
        line = json.dumps(summary)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
