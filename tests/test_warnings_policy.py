"""Warnings-budget policy guards (r11 verdict task 4).

Two enforcement layers live elsewhere — pytest.ini promotes the
package's own DeprecationWarnings to hard errors, and
tests/conftest.py fails the session when total recorded warnings
exceed WARNING_BUDGET. These tests pin both layers in place so a
refactor can't silently drop them, and pin the budget itself so it
can only ratchet DOWN (the "written floor" the policy promises).
"""

from __future__ import annotations

import configparser
from pathlib import Path

import conftest

REPO = Path(__file__).resolve().parent.parent
PKG = "development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark"


def test_own_code_deprecations_are_errors():
    ini = configparser.ConfigParser()
    ini.read(REPO / "pytest.ini")
    filters = ini.get("pytest", "filterwarnings").strip().splitlines()
    assert any(
        f.strip().startswith("error::DeprecationWarning:" + PKG)
        for f in filters
    ), "pytest.ini lost the own-code DeprecationWarning->error filter"
    # tests/ has no __init__.py, so test modules are TOP-LEVEL names —
    # the filter must match 'test_.*', not 'tests.*' (which was dead:
    # found in r12 review, behavior pinned by the nested probe below)
    assert any(
        f.strip().startswith("error::DeprecationWarning:test_")
        for f in filters
    ), "pytest.ini lost the tests-tree DeprecationWarning->error filter"


def test_budget_floor_only_ratchets_down():
    # The budget is a ceiling on total suite warnings. 150 is the r12
    # calibration (the full run recorded zero once the GIF LZW stores
    # were bounded); raising it past this pin requires editing BOTH
    # files with justification.
    assert isinstance(conftest.WARNING_BUDGET, int)
    assert 0 < conftest.WARNING_BUDGET <= 150, (
        "WARNING_BUDGET regressed past the written floor — fix the new "
        "warning source instead of raising the budget"
    )


def test_budget_hooks_are_wired():
    assert callable(getattr(conftest, "pytest_warning_recorded", None))
    assert callable(getattr(conftest, "pytest_sessionfinish", None))


def test_over_budget_run_fails():
    """End-to-end enforcement: a run whose tests emit more warnings
    than WARNING_BUDGET must exit non-zero even when every test
    passes (session.exitstatus is flipped in pytest_sessionfinish).

    The probe file must live under tests/ so this conftest applies
    (conftest discovery follows the test file's ancestry, not rootdir).
    Its name deliberately does NOT match python_files ('test_*.py') so
    a leftover from a crashed run is invisible to normal collection —
    the nested run passes it as an explicit path, which pytest
    collects regardless of the pattern."""
    import subprocess
    import sys

    noisy = Path(__file__).parent / "budget_probe_for_nested_run.py"
    noisy.write_text(
        "import warnings\n"
        "def test_noise():\n"
        f"    for i in range({conftest.WARNING_BUDGET + 50}):\n"
        "        warnings.warn(f'budget probe {i}', UserWarning)\n"
    )
    try:
        proc = subprocess.run(
            [
                sys.executable, "-m", "pytest", str(noisy), "-q",
                "-p", "no:cacheprovider",
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=120,
        )
    finally:
        noisy.unlink()
    assert "1 passed" in proc.stdout, proc.stdout + proc.stderr
    assert proc.returncode == 1, (
        f"over-budget run exited {proc.returncode}; enforcement lost?\n"
        + proc.stdout + proc.stderr
    )
    assert "over the budget" in proc.stderr + proc.stdout


def test_test_module_deprecation_is_an_error():
    """End-to-end enforcement of the tests-tree filter: a DeprecationWarning
    raised from a module whose top-level name matches ``test_.*`` must
    FAIL under pytest.ini. The first version of the filter ('tests.*')
    was empirically dead — tests/ has no __init__.py, so modules import
    as top-level names and the package-style regex never matched; this
    probe would have caught that. The probe file name matches the
    filter pattern (it must, to exercise it); a leftover from a crashed
    run fails the suite LOUDLY via this very policy, not silently."""
    import subprocess
    import sys

    noisy = Path(__file__).parent / "test_zz_deprecation_probe_tmp.py"
    noisy.write_text(
        "import warnings\n"
        "def test_deprecated_api_use():\n"
        "    warnings.warn('probe: deprecated API', DeprecationWarning)\n"
    )
    try:
        proc = subprocess.run(
            [
                sys.executable, "-m", "pytest", str(noisy), "-q",
                "-p", "no:cacheprovider",
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=120,
        )
    finally:
        noisy.unlink()
    assert "1 failed" in proc.stdout, (
        "DeprecationWarning from a test module did not error — the "
        "tests-tree filter is dead again:\n" + proc.stdout + proc.stderr
    )
    assert "DeprecationWarning" in proc.stdout
