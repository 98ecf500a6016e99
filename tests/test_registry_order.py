"""The driver harness verifies only the first ``DRIVER_CAP`` entries of
``queries()`` (rounds 1-2 each checked exactly the first 50 registered).
These tests pin the rotation POLICY so the checked set stays a
deliberate decision — and since r09 they derive the lifetime-green
ledger from the committed CORRECTNESS_r*.json artifacts instead of
hand-maintained name sets, so a rotation can't silently desync the
policy from the history it is supposed to encode:

* every query with NO driver hash-green row yet (brand-new this round)
  must sit inside the cap — a first row outranks any confirmation;
* everything past the cap must already hold >=2 lifetime driver-green
  rows (the local replica harness still oracle-checks every registered
  query on every run — the tail loses only the per-round driver row).
"""

from __future__ import annotations

import glob
import json
from pathlib import Path

from level2_to_cassandra_spark import registry

REPO = Path(__file__).resolve().parent.parent


def _is_green(res: dict) -> bool:
    """True iff a driver row is a PASS: no error, rows matched, and
    the value hash not recorded as a failure (None = rows-only check,
    the weaker-but-valid form; False = a real value mismatch and must
    never count as a confirmation — self-review r09)."""
    return bool(
        res.get("err") is None
        and res.get("rows_match")
        and res.get("hash_match") is not False
    )


def _lifetime_green() -> dict[str, int]:
    """query -> number of driver rounds it was recorded green in."""
    counts: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        for name, res in json.loads(Path(f).read_text()).items():
            if _is_green(res):
                counts[name] = counts.get(name, 0) + 1
    return counts


def test_order_covers_registry_exactly():
    names = list(registry.all_queries().keys())
    assert names == list(registry.DRIVER_ORDER)
    assert len(names) == len(set(names))


def test_never_checked_queries_inside_driver_cap():
    """A query with zero lifetime driver rows (new this round) must be
    in-cap so it earns its first independent hash row."""
    green = _lifetime_green()
    in_cap = set(registry.DRIVER_ORDER[: registry.DRIVER_CAP])
    never = {n for n in registry.DRIVER_ORDER if green.get(n, 0) == 0}
    missing = never - in_cap
    assert not missing, f"never-driver-checked queries past the cap: {missing}"


def test_only_multiply_green_queries_past_cap():
    """Everything past the cap must already be driver-green at least
    twice across recorded rounds — rotation trades confirmations, never
    unverified coverage."""
    green = _lifetime_green()
    tail = registry.DRIVER_ORDER[registry.DRIVER_CAP:]
    thin = {n: green.get(n, 0) for n in tail if green.get(n, 0) < 2}
    assert not thin, f"past-cap queries with <2 lifetime green rows: {thin}"


def test_cap_prioritizes_stale_confirmations():
    """The in-cap confirmation slots (cap minus the brand-new names)
    must lean older than the tail: no past-cap name may be STALER than
    the stalest in-cap confirmation by more than one round.  This is
    the 'no name's last green row older than ~4 rounds' rotation rule
    in mechanical form, tolerant to the handful of deliberate
    touched-this-round re-verifications.

    Lifecycle (VERDICT r09 #1 + self-review r10): the staleness
    comparison describes the cap AT ROTATION TIME — the moment the
    driver's round artifact lands, every in-cap name becomes maximally
    fresh by construction and the comparison would trip on its own
    success.  So the check accepts the post-artifact state (every
    in-cap name with history green in the NEWEST artifact) — but ONLY
    while the past-cap tail is within the staleness budget.  Without
    that bound the short-circuit also matches 'nobody rotated and the
    same cap got re-confirmed', and the tail could age forever with
    the test green; with it, skipping rotation for enough rounds turns
    the suite red and forces the overdue rotation."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(Path(f).stem.split("_r")[1])
        for name, res in json.loads(Path(f).read_text()).items():
            if _is_green(res):
                last[name] = rnd
    tail = [n for n in registry.DRIVER_ORDER[registry.DRIVER_CAP:]
            if n in last]
    in_cap = [n for n in registry.DRIVER_ORDER[: registry.DRIVER_CAP]
              if n in last]
    if not tail or not in_cap:
        return
    newest = max(last.values())
    oldest_tail = min(last[n] for n in tail)
    if all(last[n] == newest for n in in_cap):
        # post-artifact state: the cap just earned its rows.  Policy
        # satisfied only while no tail name's last green row is older
        # than the ~5-round budget (VERDICT r09 task #1's bar).
        assert newest - oldest_tail <= 5, (
            f"rotation overdue: the newest artifact is r{newest:02d} but "
            f"the tail's stalest confirmation is r{oldest_tail:02d} — "
            "rotate the stale tail into the cap"
        )
        return
    oldest_cap = min(last[n] for n in in_cap)
    assert oldest_cap <= oldest_tail + 1, (
        f"cap holds fresher confirmations (oldest r{oldest_cap:02d}) than "
        f"the tail's stalest name (r{oldest_tail:02d}) — rotate the stale "
        "tail in first"
    )


def test_entry_module_preserves_order():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries().keys()) == list(registry.DRIVER_ORDER)
