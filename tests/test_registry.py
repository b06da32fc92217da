"""Registry check-budget ordering: the external driver consumes keys
in registration order with a finite budget, so the ordering IS the
policy for which keys earn hard correctness evidence each round."""

from __future__ import annotations

from dags_spark import registry


def test_ordering_tiers():
    specs = registry.all_specs()
    names = list(specs)

    # stale-evidence keys (prior failures / round-changed outputs) first
    verified = registry._driver_verified()
    recheck = [
        n
        for n, rnd in registry._RECHECK_FIRST.items()
        if verified.get(n, 0) < rnd
    ]
    assert names[: len(recheck)] == recheck

    # round-4 policy: EVERY never-evidenced key precedes every
    # already-evidenced key (so a finite driver budget rotates
    # coverage); within the unproven block: streaming first, then
    # rows-only (the only evidence those keys can earn), then the
    # hash tail (which rolls round-over-round).
    tiers = [
        (0, 0) if n in recheck
        else (2, 0) if verified.get(n, 0) > 0
        else (1, 0) if s.module == "streaming"
        else (1, 1) if s.check != "hash"
        else (1, 2)
        for n, s in specs.items()
    ]
    assert tiers == sorted(tiers), "registry order does not follow tiers"

    # the never-evidenced streaming surface must fit inside a 50-key
    # driver budget (VERDICT r03 defect #1): recheck + streaming < 50
    stream_never = [
        n
        for n, s in specs.items()
        if s.module == "streaming" and verified.get(n, 0) == 0
    ]
    if stream_never:
        assert max(names.index(n) for n in stream_never) < 50


def test_driver_verified_reads_correctness_files():
    v = registry._driver_verified()
    # the hardcoded round-1 set is always included
    assert "scan_parquet" in v and "agg_pricing_summary" in v
    # the round-1 failure is not in the HARDCODED set (later rounds'
    # CORRECTNESS files may legitimately mark it green once re-checked)
    assert "agg_collect_sorted" not in registry._DRIVER_VERIFIED


def test_every_hash_key_has_oracle_and_consistent_maps():
    specs = registry.all_specs()
    oracles = registry.oracle_sql()
    for name, spec in specs.items():
        if spec.check == "hash":
            assert name in oracles and oracles[name].strip(), name
        else:
            assert name not in oracles or oracles[name] is None
    assert set(registry.queries()) == set(specs)


def test_api_facade_exports_resolve():
    import dags_spark.api as api

    missing = [n for n in api.__all__ if not hasattr(api, n)]
    assert not missing


def test_survey_inventory_block_in_sync():
    """SURVEY.md's §2 totals are GENERATED from the registry
    (tools/inventory_sync.py — VERDICT r5 directive 10); any key
    added without regenerating the block fails here."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    res = subprocess.run(
        [sys.executable, str(repo / "tools" / "inventory_sync.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stdout + res.stderr


def test_checklog_sweep_is_complete_and_green():
    """CI-enforces the 'all keys green in one run' claim (VERDICT r6
    item 6): the newest CHECKLOG_r*.txt must be a SINGLE-PASS sweep
    whose per-key PASS/ROWS lines cover the registry exactly — every
    registered key present, zero FAIL lines, no stale keys. If the
    registry has grown since the last sweep, the test fails with the
    missing keys so the round cannot close without rerunning
    tools/check.py in full."""
    import re
    from pathlib import Path

    from dags_spark.registry import all_specs

    root = Path(__file__).resolve().parent.parent
    logs = sorted(root.glob("CHECKLOG_r*.txt"))
    assert logs, "no CHECKLOG_r*.txt — run: python tools/check.py > CHECKLOG_rN.txt"
    text = logs[-1].read_text()
    passed = set(re.findall(r"^(?:PASS|ROWS) (\S+):", text, re.M))
    failed = set(re.findall(r"^FAIL (\S+)", text, re.M))
    failed |= set(re.findall(r"^ROWS (\S+): \[FAIL", text, re.M))
    assert not failed, f"{logs[-1].name} records failures: {sorted(failed)[:10]}"
    keys = set(all_specs())
    # every rows-checked key must carry its paired property-test
    # verdict in the same sweep session (VERDICT r7 directive #7)
    rows_keys = {k for k, s in all_specs().items() if s.check == "rows"}
    stamped = set(re.findall(r"^ROWS (\S+): \[ok: prop-tests passed", text, re.M))
    unstamped = (rows_keys & passed) - stamped
    assert not unstamped, (
        f"{logs[-1].name}: rows keys missing a property-test verdict "
        f"(rerun tools/check.py): {sorted(unstamped)[:10]}"
    )
    missing = keys - passed
    stale = passed - keys
    assert not missing, (
        f"{logs[-1].name} does not cover {len(missing)} registered keys "
        f"(registry grew since the sweep): {sorted(missing)[:10]} — rerun "
        "the full tools/check.py sweep"
    )
    assert not stale, f"{logs[-1].name} lists unregistered keys: {sorted(stale)[:10]}"


def test_judge_artifacts_are_clean():
    """CI-enforces the two per-round judge invariants the same way
    the checklog gap is enforced (VERDICT r8 directive #8): the
    leak probe must record ZERO hits across every probe class, and
    the copy detector must flag ZERO files. A regression in either
    fails the suite at the frozen state instead of surfacing only at
    judging time."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    leak = json.loads((root / "LEAKCHECK.json").read_text())
    assert leak["n_hits"] == 0, f"LEAKCHECK records hits: {leak['hits']}"
    assert all(not v for v in leak["hits"].values()), leak["hits"]
    copy = json.loads((root / "COPYCHECK.json").read_text())
    assert copy["flagged"] == [], f"COPYCHECK flagged: {copy['flagged']}"
