"""Window tooling (tools/make_window.py) — the rotation derivation is
load-bearing round infrastructure: a wrong --check verdict either blocks
a healthy close or lets a stale committed head ship."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import make_window  # noqa: E402


def test_check_verdict_in_sync():
    code, msg = make_window.check_verdict(["a", "b"], ["a", "b"], 13, {"x"})
    assert code == 0 and "in sync" in msg


def test_check_verdict_round_open_is_regen_due_not_drift():
    """Round-13 verdict item 6: on a tree where the newest CORRECTNESS
    record postdates the committed head — the committed names are
    exactly the set the driver just checked — the verdict is the
    designed round-open state (exit 2, self-describing message), not
    the drift error."""
    cur = ["q1", "x2", "x3"]
    head = ["x9", "q1", "x2"]  # rotation: the new records moved the head
    code, msg = make_window.check_verdict(cur, head, 13, {"q1", "x2", "x3"})
    assert code == 2
    assert "REGEN DUE" in msg and "round 14 open" in msg and "r13" in msg
    assert "DRIFT" not in msg


def test_check_verdict_true_drift_still_exits_one():
    """A committed head that matches NEITHER the derivation NOR the
    newest driver record is genuine desync — hand-edited or stale from
    an older round — and keeps the loud drift error."""
    code, msg = make_window.check_verdict(
        ["q1", "hand_edited"], ["x9", "q1"], 13, {"q1", "x2"}
    )
    assert code == 1
    assert "WINDOW DRIFT" in msg
    assert "x9" in msg and "hand_edited" in msg


def test_check_verdict_order_only_difference_vs_checked_set():
    """The round-open test is SET equality against the driver record
    (the record is a dict, unordered), but head comparison stays
    order-sensitive: a committed head with the right names in the wrong
    order against the DERIVED head is caught by the set-vs-record rule
    only if the driver actually checked those names."""
    # same names as derived head but reordered, and NOT what the driver
    # checked -> drift (order matters for the committed artifact)
    code, _ = make_window.check_verdict(["b", "a"], ["a", "b"], 13, {"z"})
    assert code == 1


def test_newest_correctness_parses_driver_records():
    rnd, checked = make_window.newest_correctness()
    assert rnd >= 13
    assert len(checked) == 50
    assert all(isinstance(n, str) for n in checked)
