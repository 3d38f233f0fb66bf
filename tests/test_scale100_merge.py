"""run_scale100.py merge contract (r12 verdict "what's wrong" #1 and
the r12 advice on dropped stability verdicts): crawl rows and
per-session stability records ACCUMULATE across sessions, and a
battery note survives a merge only while the data row it was stamped
with is still the live row — prose can never outlive its data again."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _mod():
    spec = importlib.util.spec_from_file_location(
        "run_scale100", REPO / "scripts" / "run_scale100.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stability_verdicts_accumulate_not_overwrite():
    mod = _mod()
    prior = {
        "session_stability": [
            {"max_over_min": {"t_ratio": 1.5}, "stable_within_1p3x": False}
        ]
    }
    out = mod.merge_sessions(prior, [], {"t_ratio": 1.1}, {})
    assert len(out["session_stability"]) == 2
    assert out["session_stability"][0]["stable_within_1p3x"] is False
    assert out["session_stability"][1]["stable_within_1p3x"] is True
    # the artifact-level verdict reflects EVERY session, so one
    # unstable session keeps the headline honest forever
    assert out["all_sessions_stable_within_1p3x"] is False


def test_crawl_runs_accumulate():
    mod = _mod()
    prior = {"crawl_runs": [{"t_ratio": 9.0}]}
    out = mod.merge_sessions(prior, [{"t_ratio": 10.0}], {"t1": 1.0}, {})
    assert out["crawl_t_ratio_samples"] == [9.0, 10.0]


def test_stale_battery_note_is_dropped_fresh_note_survives():
    mod = _mod()
    prior = {
        "batteries": {"op_a": {"t_ratio": 13.8}, "op_b": {"t_ratio": 2.0}},
        "battery_notes": {
            "op_a": {"note": "narrates 13.8x", "data_row": {"t_ratio": 13.8}},
            "op_b": {"note": "narrates 2.0x", "data_row": {"t_ratio": 2.0}},
        },
    }
    # this session re-measures op_a (new row) and leaves op_b alone
    out = mod.merge_sessions(
        prior, [], {"t1": 1.0}, {"op_a": {"t_ratio": 1.55}}
    )
    assert out["batteries"]["op_a"] == {"t_ratio": 1.55}
    assert "op_a" not in out["battery_notes"], (
        "a note narrating a replaced data row must not survive the merge"
    )
    assert out["battery_notes"]["op_b"]["note"] == "narrates 2.0x"


def test_session_note_survives_only_with_matching_stability_record():
    mod = _mod()
    rec0 = {"max_over_min": {"t_ratio": 1.39}, "stable_within_1p3x": False}
    prior = {
        "session_stability": [rec0],
        "session_notes": [
            {"session": 0, "stability": rec0, "note": "1x-leg denominator"},
            # stamped record diverged from the session at its index
            {
                "session": 0,
                "stability": {"max_over_min": {"t_ratio": 9.9}},
                "note": "stale",
            },
            # index out of range after this merge (sessions: 2)
            {"session": 5, "stability": rec0, "note": "orphan"},
        ],
    }
    out = mod.merge_sessions(prior, [], {"t_ratio": 1.1}, {})
    kept = [n["note"] for n in out["session_notes"]]
    assert kept == ["1x-leg denominator"], out["session_notes"]


def test_legacy_prior_without_new_keys_merges_clean():
    mod = _mod()
    out = mod.merge_sessions({}, [{"t_ratio": 8.0}], {"t1": 1.2}, {"op": {"t_ratio": 3.0}})
    assert out["crawl_t_ratio_samples"] == [8.0]
    assert len(out["session_stability"]) == 1
    assert out["batteries"] == {"op": {"t_ratio": 3.0}}
    assert out["battery_notes"] == {}
