"""Automates the driver-window rotation discipline: the correctness
driver checks only the FIRST 50 ``queries()`` entries per round, so
registration order is a coverage budget. These tests fail the build if
any catalog query would silently go stale (no hard driver verdict within
the last two recorded rounds) without being queued in the upcoming
window — the check the judge previously had to do by hand."""

from __future__ import annotations

import json
from pathlib import Path

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
    QUERIES,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
    _DRIVER_PRIORITY,
    _QUERY_HASHES,
    _REQUEUED,
    _discount_edited,
    _rank_window,
    _recorded_query_hashes,
)

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50  # the driver evaluates the first 50 queries() entries


def _verdicts() -> tuple[int, dict[str, int]]:
    """(latest_round, {query: last_green_round}) from CORRECTNESS_r*.json."""
    last_green: dict[str, int] = {}
    latest = 0
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        r = int(f.stem.split("_r")[1])
        latest = max(latest, r)
        for q, v in json.loads(f.read_text()).items():
            ok = (
                v.get("hash_match")
                if v.get("hash_match") is not None
                else v.get("rows_match")
            )
            if ok:
                last_green[q] = max(last_green.get(q, 0), r)
    return latest, last_green


def test_priority_list_shape():
    """Exactly one driver window, no wasted or duplicate slots, every
    name resolvable, and the registration order actually honors it."""
    assert len(_DRIVER_PRIORITY) == WINDOW
    assert len(set(_DRIVER_PRIORITY)) == WINDOW
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"_DRIVER_PRIORITY names unknown queries: {missing}"
    assert list(QUERIES)[:WINDOW] == _DRIVER_PRIORITY


def test_no_query_goes_stale():
    """Every catalog query either has a green driver verdict within the
    last K recorded rounds, or is queued in the upcoming window.

    K is the TIGHTEST bound the catalog size makes satisfiable:
    max(2, ceil((N − WINDOW) / WINDOW)) — the worst-case backlog of
    queries unverified in the last K rounds is N − K·WINDOW ≤ WINDOW,
    which always fits the window (see catalog._computed_driver_priority).
    At N ≤ 150 this is the original 2-round bound; growth relaxes it
    honestly instead of making the tripwire arithmetically impossible."""
    latest, last_green = _verdicts()
    window = set(_DRIVER_PRIORITY)
    n = len(QUERIES)
    k = max(2, -(-(n - WINDOW) // WINDOW))
    stale = [
        q
        for q in QUERIES
        if last_green.get(q, 0) < latest - (k - 1) and q not in window
    ]
    assert not stale, (
        f"queries with no driver verdict since r{latest - (k - 1)} "
        f"(K={k}-round bound at N={n}) and not in the upcoming window: "
        f"{stale} — rotate them into _DRIVER_PRIORITY"
    )


def test_never_verified_queries_lead_the_window():
    """Queries with NO driver verdict at all (newly registered) must be
    at the FRONT of the window — they are the coverage debt. Requeued
    (plan-edited) queries share rank 0 with them, so the front region
    is sized to hold both."""
    _latest, last_green = _verdicts()
    never = [q for q in QUERIES if q not in last_green]
    for q in never:
        assert q in _DRIVER_PRIORITY, f"never-verified {q} not in window"
        assert _DRIVER_PRIORITY.index(q) < len(never) + len(_REQUEUED) + 4, (
            f"never-verified {q} is buried at slot "
            f"{_DRIVER_PRIORITY.index(q)} — front-load it"
        )


# ---------------------------------------------------------------------------
# Plan-edit awareness (round 11): a green verdict only counts if it was
# earned on the query's CURRENT content (plans/contenthash.py +
# QUERY_HASHES.json). These tests pin the r10 verdict's "done" criteria:
# an edited old-green query leads the next window, mechanically.
# ---------------------------------------------------------------------------


def test_edited_query_leads_next_window():
    """Simulate the exact r10 failure mode: a query greened long ago is
    edited (live hash drifts from the recorded one) — the recomputed
    window must put it at the very front, ahead of every oldest-green
    backfill."""
    latest, last_green = _verdicts()
    names = list(QUERIES)
    # pick the MOST RECENTLY greened query — the one the pure
    # oldest-green ranking would bury deepest
    victim = max(last_green, key=lambda q: (last_green[q], -names.index(q)))
    recorded = {
        q: {"hash": f"h-{q}", "since_round": 0} for q in names
    }
    live = {q: f"h-{q}" for q in names}
    live[victim] = "h-EDITED"
    eff = _discount_edited(last_green, recorded, live)
    assert victim not in eff, "edited query must lose its green rank"
    window = _rank_window(eff, names)
    assert window[0] == victim, (
        f"edited {victim} should LEAD the window, got {window[:3]}"
    )


def test_green_predating_since_round_requeues():
    """A recorded hash newer than the query's last green verdict means
    the verdict was earned on old content — the query must requeue even
    though live and recorded hashes agree (the gen-script-stamped case,
    e.g. the r10 run-length-fold rewrites)."""
    last_green = {"qa": 7, "qb": 9}
    recorded = {
        "qa": {"hash": "ha", "since_round": 10},  # edited in r10, green r7
        "qb": {"hash": "hb", "since_round": 0},
    }
    live = {"qa": "ha", "qb": "hb"}
    eff = _discount_edited(last_green, recorded, live)
    assert "qa" not in eff and eff["qb"] == 9
    assert _rank_window(eff, ["qb", "qa"])[0] == "qa"


def test_requeued_queries_are_in_the_live_window():
    """Whatever the hash gate requeued from the REAL repo state must
    fill every window slot the artifact-age hard contract doesn't
    claim — the live check that an edit landing in round N earns a
    driver verdict as early as capacity allows (round N when the
    requeue fits; overflow drains in later rounds because requeued
    rank stays 0 until re-greened, so no FRESH query may hold a slot
    while a requeued one waits)."""
    latest, last_green = _verdicts()
    k = max(2, -(-(len(QUERIES) - WINDOW) // WINDOW))
    hard = {q for q in QUERIES if last_green.get(q, 0) < latest - (k - 1)}
    window = list(_DRIVER_PRIORITY)
    in_window = [q for q in _REQUEUED if q in window]
    waiting = [q for q in _REQUEUED if q not in window]
    if waiting:
        # overflow: every non-hard slot must be spent on a requeued query
        fresh = [q for q in window if q not in hard and q not in _REQUEUED]
        assert not fresh, (
            f"requeued {waiting[:5]} wait outside the window while fresh "
            f"queries {fresh[:5]} hold slots"
        )
    # requeued in-window queries sit directly after the hard group
    for q in in_window:
        assert window.index(q) < len(hard & set(window)) + len(in_window), (
            f"requeued {q} buried at slot {window.index(q)}"
        )


def test_query_hashes_artifact_fresh():
    """Standing-round enforcement (same convention as the PLANS.md and
    vanilla-gates guards): QUERY_HASHES.json must record every catalog
    query at its LIVE content hash. Red here means a package edit
    landed without re-running scripts/gen_query_hashes.py — drifted
    queries would burn driver window slots every round until regenerated."""
    recorded = _recorded_query_hashes()
    assert recorded, "QUERY_HASHES.json absent — run scripts/gen_query_hashes.py"
    drifted = [
        q for q, h in _QUERY_HASHES.items()
        if recorded.get(q, {}).get("hash") != h
    ]
    assert not drifted, (
        f"{len(drifted)} queries drifted from QUERY_HASHES.json "
        f"({drifted[:8]}) — re-run scripts/gen_query_hashes.py"
    )
    orphans = sorted(set(recorded) - set(_QUERY_HASHES))
    assert not orphans, f"QUERY_HASHES.json records dropped queries: {orphans}"


def test_window_is_computed_and_contains_all_stale():
    """The window is derived from the artifacts (not hand-rotated): it
    must contain EVERY currently-stale query, with the stale set at the
    front region (oldest-first ranking)."""
    latest, last_green = _verdicts()
    k = max(2, -(-(len(QUERIES) - WINDOW) // WINDOW))  # same bound as above
    stale = [
        q for q in QUERIES if last_green.get(q, 0) < latest - (k - 1)
    ]
    assert len(stale) <= WINDOW
    assert set(stale) <= set(_DRIVER_PRIORITY)


def test_window_self_rotates_across_simulated_rounds():
    """Invariant: if each round's driver verifies exactly the computed
    window, then at EVERY future round the recomputed window contains
    every stale query — i.e. the r4 failure mode (hand-rotated list
    going stale the moment a new artifact lands) is impossible. 20
    simulated rounds cover several full rotation cycles of the
    129-query catalog."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        _rank_window,
    )

    latest, last_green = _verdicts()
    names = list(QUERIES)
    green = dict(last_green)
    k = max(2, -(-(len(names) - WINDOW) // WINDOW))  # same bound as above
    for future in range(latest + 1, latest + 21):
        # round `future`: the driver verifies the computed window...
        window = _rank_window(green, names)
        assert len(window) == WINDOW and len(set(window)) == WINDOW
        for q in window:
            green[q] = future
        # ...its artifact lands (latest = future), the window recomputes
        # at import — and the staleness check against THAT window must
        # hold, which is exactly what the judge's pytest run evaluates
        stale = [q for q in names if green.get(q, 0) < future - (k - 1)]
        assert len(stale) <= WINDOW, f"debt overflow at r{future}: {len(stale)}"
        next_window = _rank_window(green, names)
        missing = [q for q in stale if q not in next_window]
        assert not missing, f"r{future} would go stale: {missing}"


def test_window_requeues_failures_first():
    """A query whose latest verdict FAILED keeps its older green round,
    so the computed ranking automatically re-queues it at the front of
    the next window — the '(b) failures re-confirm' rule, mechanically."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        _rank_window,
    )

    names = list(QUERIES)
    latest, last_green = _verdicts()
    green = dict(last_green)
    window = _rank_window(green, names)
    victim = window[0]
    # simulate: next round verifies the window green EXCEPT the victim
    nxt = latest + 1
    for q in window:
        if q != victim:
            green[q] = nxt
    rewindow = _rank_window(green, names)
    assert victim in rewindow[: len(names) - 2 * WINDOW + 1 + 5], (
        "failed query should lead the recomputed window"
    )


def test_gen_query_hashes_merge_semantics():
    """The snapshot script's merge core: unchanged hashes KEEP their
    since_round (a re-run must not reset verification history), changed
    or new queries are stamped with the upcoming round, dropped queries
    disappear — the exact lifecycle the since_round discount relies on."""
    import importlib.util
    import sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "gen_query_hashes",
        Path(__file__).resolve().parent.parent / "scripts" / "gen_query_hashes.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    old = {
        "kept": {"hash": "h1", "since_round": 3},
        "edited": {"hash": "h2-old", "since_round": 5},
        "dropped": {"hash": "h3", "since_round": 1},
    }
    live = {"kept": "h1", "edited": "h2-new", "brand_new": "h4"}
    hashes, changed = mod.merge_hashes(old, live, default_since=11)
    assert hashes["kept"] == {"hash": "h1", "since_round": 3}
    assert hashes["edited"] == {"hash": "h2-new", "since_round": 11}
    assert hashes["brand_new"] == {"hash": "h4", "since_round": 11}
    assert "dropped" not in hashes
    assert changed == ["brand_new", "edited"]
    # idempotence: a second run over its own output changes nothing
    again, changed2 = mod.merge_hashes(hashes, live, default_since=12)
    assert again == hashes and changed2 == []


def test_mass_requeue_drains_while_age_bound_holds():
    """Simulate forward from the REAL repo state (a shared-helper edit
    can invalidate more queries than the window holds — e.g. the r11
    textops edit requeued 65): if each round's driver greens exactly
    the computed window, the requeue backlog must drain within
    ceil(|requeued| / WINDOW) + 1 rounds AND the artifact-age K-bound
    must hold at every intermediate round — i.e. best-effort re-checks
    never starve the hard contract, and vice versa."""
    latest, last_green = _verdicts()
    names = list(QUERIES)
    k = max(2, -(-(len(names) - WINDOW) // WINDOW))
    green = dict(last_green)
    pending = set(_REQUEUED) or set(names[:65])  # non-trivial either way
    deadline = -(-len(pending) // WINDOW) + 1
    for step in range(1, 6):
        future = max(green.values(), default=0) + 1
        eff = {q: g for q, g in green.items() if q not in pending}
        hard = {
            q for q in names if green.get(q, 0) < (future - 1) - (k - 1)
        }
        window = _rank_window(eff, names, hard_first=hard, raw_green=green)
        assert len(window) == WINDOW
        # the hard contract holds THIS round: every query stale against
        # the RECORDED history (artifacts exist through future-1, the
        # same threshold production uses) is in the window
        stale = [
            q for q in names if green.get(q, 0) < (future - 1) - (k - 1)
        ]
        missing = [q for q in stale if q not in window]
        assert not missing, f"step {step}: age-stale {missing[:5]} evicted"
        for q in window:
            green[q] = future
        pending -= set(window)
        if not pending and step >= 1:
            break
    assert not pending, f"requeue backlog failed to drain: {len(pending)} left"
    assert step <= deadline, (step, deadline)


# ---------------------------------------------------------------------------
# Scheme 2 (round 12): function-granularity content hashing. The r11
# verdict's "done" criterion, verbatim: an edit to char_entropy_col must
# requeue q_llm_char_entropy but NOT q_llm_bm25_search — i.e. the hash
# input of a query is exactly its transitive function-reference closure,
# not whole dependency files. query_content_hash is a deterministic
# digest of query_content_parts, so asserting on the parts IS asserting
# on the requeue behavior.
# ---------------------------------------------------------------------------

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (  # noqa: E402
    ORACLES,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.contenthash import (  # noqa: E402
    SCHEME,
    _stable_repr,
    query_content_hash,
    query_content_parts,
    query_content_hash_v1,
)


def _parts(q):
    return query_content_parts(QUERIES[q], ORACLES.get(q))


def test_function_granularity_blast_radius():
    """Editing char_entropy_col (operators/textops.py) must change
    q_llm_char_entropy's hash input and leave q_llm_bm25_search's
    untouched — the r12 acceptance case. Both queries reach into
    textops.py (bm25 tokenizes via textops.tokens_col), so under the
    scheme-1 FILE hash both were requeued by any textops edit; under
    scheme 2 only the actual dependent is."""
    ce = _parts("q_llm_char_entropy")
    bm = _parts("q_llm_bm25_search")
    ce_fns = set(ce["functions"])
    bm_fns = set(bm["functions"])
    assert any(k.endswith(".char_entropy_col") for k in ce_fns)
    assert not any(k.endswith(".char_entropy_col") for k in bm_fns)
    # bm25 DOES depend on textops (shared tokenizer) — the point is the
    # dependency is function-granular, not file-granular
    assert any(".textops." in k for k in bm_fns)
    assert not any(
        m.endswith(".textops") for m in bm["files"]
    ), "textops charged at file granularity — blast radius regressed"


def test_hash_is_a_pure_digest_of_parts():
    """Two queries with identical parts would hash identically, and a
    changed function source changes the hash — so the parts assertions
    above transfer to the recorded hashes."""
    q = "q_llm_char_entropy"
    h1 = query_content_hash(QUERIES[q], ORACLES.get(q))
    h2 = query_content_hash(QUERIES[q], ORACLES.get(q))
    assert h1 == h2
    assert query_content_hash(QUERIES[q], "DIFFERENT ORACLE") != h1


def test_own_module_constants_are_hashed():
    """r11 advice: a builder-referenced module-level constant (e.g. a
    schema/threshold table) must contribute to the hash — scheme 1's
    blind spot. NANOS_TS_COLUMNS (sources/tables.py) is referenced by
    load_table, which every relational builder calls."""
    p = _parts("q_rel_distinct_stats")
    assert any(k.endswith(":NANOS_TS_COLUMNS") for k in p["constants"])


def test_stable_repr_is_hashseed_independent():
    """Sets/dicts of strings iterate in PYTHONHASHSEED order; the repr
    used for constants must sort them (a flapping hash would requeue
    random queries every round). Address-bearing reprs collapse to a
    constant marker."""
    assert _stable_repr({"b", "a", "c"}) == "{'a','b','c'}"
    assert _stable_repr({"k2": 1, "k1": 2}) == _stable_repr({"k1": 2, "k2": 1})

    class Opaque:  # default repr embeds "at 0x..."
        pass

    assert _stable_repr(Opaque()).startswith("<unstable ")
    assert " at 0x" not in _stable_repr(Opaque())
    assert _stable_repr([1, (2.5, None), b"x"]) == "[1,(2.5,None),b'x']"


def test_no_file_level_fallbacks_remain():
    """Every reference in every registered query resolves to a function,
    class, or constant — zero file-granularity deps left, so no module
    edit can mass-requeue through an unresolved import. (If a future
    builder legitimately references a module AS a module this bound can
    be relaxed — the assert documents that today's catalog is fully
    resolved, which is what makes the 23-query r11 backlog the LAST
    mass requeue.)"""
    fallbacks = {
        q: sorted(query_content_parts(fn, ORACLES.get(q))["files"])
        for q, fn in QUERIES.items()
        if query_content_parts(fn, ORACLES.get(q))["files"]
    }
    assert not fallbacks, f"file-level fallbacks: {fallbacks}"


def test_scheme_migration_preserves_history():
    """merge_hashes_migrated: a recorded scheme-1 hash that still
    matches the live scheme-1 hash keeps its since_round (the algorithm
    change itself must not restamp 163 queries as edited); genuinely
    edited content is stamped with the upcoming round."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "gen_query_hashes_mig",
        Path(__file__).resolve().parent.parent / "scripts" / "gen_query_hashes.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    old = {
        "kept": {"hash": "v1-kept", "since_round": 4},
        "edited": {"hash": "v1-edited-old", "since_round": 7},
    }
    live_new = {"kept": "v2-kept", "edited": "v2-edited", "fresh": "v2-f"}
    live_old = {"kept": "v1-kept", "edited": "v1-edited-NEW", "fresh": "v1-f"}
    hashes, changed = mod.merge_hashes_migrated(old, live_new, live_old, 12)
    assert hashes["kept"] == {"hash": "v2-kept", "since_round": 4}
    assert hashes["edited"] == {"hash": "v2-edited", "since_round": 12}
    assert hashes["fresh"] == {"hash": "v2-f", "since_round": 12}
    assert changed == ["edited", "fresh"]


def test_recorded_scheme_is_current():
    """QUERY_HASHES.json must be a scheme-SCHEME snapshot — a stale
    scheme means gen_query_hashes.py wasn't re-run after a hash
    algorithm change and every query would spuriously requeue."""
    data = json.loads((REPO / "QUERY_HASHES.json").read_text())
    assert int(data.get("scheme", 1)) == SCHEME


def test_v1_retained_for_migration():
    """The scheme-1 algorithm stays importable and deterministic — it
    is the migration comparator for any FUTURE scheme bump too."""
    q = "q_rel_distinct_stats"
    assert query_content_hash_v1(QUERIES[q], ORACLES.get(q)) == \
        query_content_hash_v1(QUERIES[q], ORACLES.get(q))


def test_rotation_artifact_matches_live_breakdown():
    """ROTATION.json (r11 verdict task 6) must equal the live
    driver_window_breakdown() while it still describes the UPCOMING
    round (once the driver's CORRECTNESS artifact for that round lands,
    the snapshot is historical and exempt)."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        driver_window_breakdown,
    )

    f = REPO / "ROTATION.json"
    assert f.is_file(), "ROTATION.json absent — run scripts/gen_query_hashes.py"
    data = json.loads(f.read_text())
    latest, _ = _verdicts()
    if int(data.get("upcoming_round", -1)) != latest + 1:
        return  # historical snapshot; gen script refreshes it at round end
    live = driver_window_breakdown()
    for k in ("age_hard", "requeued", "backfill", "requeued_waiting"):
        assert data.get(k) == live[k], f"ROTATION.json stale on {k!r}"
    assert data.get("counts") == {k: len(v) for k, v in live.items()}


def test_breakdown_partitions_the_window():
    """{age_hard, requeued, backfill} must partition _DRIVER_PRIORITY
    exactly, in window order — the artifact is a faithful decomposition
    of the window, not a parallel computation that can drift."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.catalog import (
        driver_window_breakdown,
    )

    bd = driver_window_breakdown()
    recombined = bd["age_hard"] + bd["requeued"] + bd["backfill"]
    assert sorted(recombined) == sorted(_DRIVER_PRIORITY)
    assert set(bd["requeued_waiting"]).isdisjoint(_DRIVER_PRIORITY)
    # window order preserved within each group
    pos = {q: i for i, q in enumerate(_DRIVER_PRIORITY)}
    for grp in ("age_hard", "requeued", "backfill"):
        idx = [pos[q] for q in bd[grp]]
        assert idx == sorted(idx), f"{grp} not in window order"


def test_bound_methods_unwrap_to_their_function():
    """r12 review: a module-level alias bound to a method of an
    internal class (``get = registry.get``) must hash the underlying
    function's SOURCE, not the constant '<no-source builtins.method>'
    placeholder push_class(builtins.method) used to emit — otherwise
    editing the method body never requeues its dependents."""
    import types as _types

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.fs import (
        LocalFS,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.contenthash import (
        _unwrap_callable,
    )

    bound = LocalFS().exists
    assert isinstance(bound, _types.MethodType)
    fn = _unwrap_callable(bound)
    assert isinstance(fn, _types.FunctionType)
    assert fn is LocalFS.exists


# module-level on purpose: the reference walk reads the builder's
# GLOBALS (co_names) — a closure-captured instance would be invisible,
# which is fine (closures hash via the enclosing function's source)
_INST_A = None
_INST_B = None


def _instance_builder_a(spark, sf_dir):
    return _INST_A


def _instance_builder_b(spark, sf_dir):
    return _INST_B


def test_internal_instance_state_contributes_to_hash():
    """r12 review: a module-level instance of an internal class must
    contribute its configured state (``__dict__``), not only its
    class's code — two registries of the same class with different
    entries are different query content."""
    global _INST_A, _INST_B
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.fs import (
        LocalFS,
    )

    _INST_A, _INST_B = LocalFS(), LocalFS()
    _INST_A.configured = {"threshold": 1}
    _INST_B.configured = {"threshold": 2}

    pa = query_content_parts(_instance_builder_a, None)
    pb = query_content_parts(_instance_builder_b, None)
    # both walk the same LocalFS class code (only the builders' own
    # qualnames differ); the instance state must be the differing part
    shared_a = {k for k in pa["functions"] if "_instance_builder" not in k}
    shared_b = {k for k in pb["functions"] if "_instance_builder" not in k}
    assert shared_a == shared_b and any("LocalFS" in k for k in shared_a)
    ka = [v for k, v in pa["constants"].items() if "threshold" in v]
    kb = [v for k, v in pb["constants"].items() if "threshold" in v]
    assert ka and kb and ka != kb


def test_underscore_scalar_state_contributes_mutable_caches_do_not():
    """r14 advice: configured state kept in underscore attributes (a
    common convention, not only caches) must reach the drift guard —
    when the value is an immutable scalar. A mutable container in a
    "_attr" IS the lazy-cache convention: its contents change as the
    process runs, so it stays excluded (the hash is computed on first
    touch, possibly after queries have executed)."""
    global _INST_A, _INST_B
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.fs import (
        LocalFS,
    )

    _INST_A, _INST_B = LocalFS(), LocalFS()
    _INST_A._n_buckets = 8
    _INST_B._n_buckets = 64
    _INST_A._memo = {"k": 1}  # populated cache — must NOT contribute
    _INST_B._memo = {"k": 2}

    pa = query_content_parts(_instance_builder_a, None)
    pb = query_content_parts(_instance_builder_b, None)
    ca = [v for v in pa["constants"].values() if "_n_buckets" in v]
    cb = [v for v in pb["constants"].values() if "_n_buckets" in v]
    assert ca and cb and ca != cb, (pa["constants"], pb["constants"])
    assert not any("_memo" in v for v in pa["constants"].values())

    # and the cache-population NON-drift contract: filling a mutable
    # underscore cache must not change the parts at all
    _INST_A._memo["grown"] = object()
    pa2 = query_content_parts(_instance_builder_a, None)
    assert pa2 == pa


def test_slots_collected_across_the_mro():
    """r14 advice: the __slots__ fallback read only type(obj).__slots__,
    so an instance whose slots live on a BASE class contributed no
    state. Slots must be collected across the MRO."""
    global _INST_A, _INST_B
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
        contenthash,
    )

    class _SlotBase:
        __slots__ = ("base_knob",)
        __module__ = contenthash._PKG_NAME + ".fs"

    class _SlotChild(_SlotBase):
        __slots__ = ("child_knob",)
        __module__ = contenthash._PKG_NAME + ".fs"

        def __init__(self, base_v, child_v):
            self.base_knob = base_v
            self.child_knob = child_v

    _INST_A = _SlotChild("alpha", "x")
    _INST_B = _SlotChild("beta", "x")  # differs ONLY in the base slot

    pa = query_content_parts(_instance_builder_a, None)
    pb = query_content_parts(_instance_builder_b, None)
    ca = [v for v in pa["constants"].values() if "base_knob" in v]
    cb = [v for v in pb["constants"].values() if "base_knob" in v]
    assert ca and cb and ca != cb, (pa["constants"], pb["constants"])


def test_lazily_assigned_underscore_scalars_are_excluded():
    """r14 review of the underscore widening: an underscore scalar
    with a ``self.X = …`` assignment site OUTSIDE __init__ is
    lazily-populated state — its value depends on which methods have
    run before the hash is computed — so it must stay out of the
    instance-state hash even though its VALUE is an immutable scalar.
    _Extractor._drop_depth (html.py) is exactly that shape: an int,
    initialized in __init__, mutated by handle_starttag/endtag."""
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.html import (
        _Extractor,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.contenthash import (
        _non_init_self_assigned,
    )

    mutated = _non_init_self_assigned(_Extractor)
    assert "_drop_depth" in mutated, mutated

    global _INST_A, _INST_B
    _INST_A, _INST_B = _Extractor(), _Extractor()
    _INST_B._drop_depth = 3  # as if mid-parse when the hash ran
    pa = query_content_parts(_instance_builder_a, None)
    pb = query_content_parts(_instance_builder_b, None)
    va = [v for k, v in pa["constants"].items() if "_INST_A" in k]
    vb = [v for k, v in pb["constants"].items() if "_INST_B" in k]
    assert va == vb, (va, vb)  # identical despite the mutated counter
    assert not any("_drop_depth" in v for v in va)


def test_dynamic_mutation_sites_detected():
    """r15 advice: lazily-populated state written via ``setattr(self,
    …)``, ``object.__setattr__``, ``self.__setattr__`` or
    ``self.__dict__[…] = …`` escaped the literal-target scan, so such
    an underscore scalar would enter the instance hash and drift across
    processes — exactly the failure the guard exists to prevent. Each
    call shape must register; a NON-constant attribute name falls back
    to the "*" skip-all sentinel. Driven through the source-text scan
    (``_mutation_sites_in_source``) because a class defined inside a
    test function has no inspect-retrievable source — the class-object
    wrapper's no-source conservatism is asserted separately below."""
    import textwrap

    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans import (
        contenthash,
    )
    from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.plans.contenthash import (
        _mutation_sites_in_source,
        _non_init_self_assigned,
    )

    via_setattr = textwrap.dedent(
        """
        class _ViaSetattr:
            def __init__(self):
                self._hits = 0

            def touch(self):
                setattr(self, "_hits", self._hits + 1)
        """
    )
    via_dunder = textwrap.dedent(
        """
        class _ViaDunder:
            def touch(self):
                object.__setattr__(self, "_oset", 1)
                self.__setattr__("_sset", 2)
                self.__dict__["_dset"] = 3
        """
    )
    via_dynamic = textwrap.dedent(
        """
        class _ViaDynamicName:
            def touch(self, name):
                setattr(self, name, 1)
        """
    )
    via_super = textwrap.dedent(
        """
        class _ViaSuper:
            def touch(self):
                super().__setattr__("_zset", 1)
                super(_ViaSuper, self).__setattr__("_tset", 2)
        """
    )
    assert "_hits" in _mutation_sites_in_source(via_setattr)
    dunder = _mutation_sites_in_source(via_dunder)
    assert {"_oset", "_sset", "_dset"} <= dunder, dunder
    assert "*" in _mutation_sites_in_source(via_dynamic)
    # super().__setattr__: fn.value is a CALL, not a Name — the r16
    # branch (r15 advice: this shape escaped both Name branches while
    # the comment claimed coverage)
    sup = _mutation_sites_in_source(via_super)
    assert {"_zset", "_tset"} <= sup, sup
    # __init__-only literal assignment still registers nothing
    assert not _mutation_sites_in_source(
        "class _C:\n    def __init__(self):\n        self._cfg = 1\n"
    )

    # and the class-object wrapper stays conservative when source is
    # unretrievable (a dynamically-defined internal class): skip-all
    _Local = type(
        "_Local", (), {"__module__": contenthash._PKG_NAME + ".fs"}
    )
    assert "*" in _non_init_self_assigned(_Local)
