"""README/STATUS headline counts must match the live registry
(VERDICT r12 #5: the hand-edited README count lagged the registry two
rounds running; STATUS's plan/sweep counts drifted by 3-5). The counts
are emitted by tools/gen_counts.py; this gate fails when either file
drifts from what the emitter would write."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_counts():
    spec = importlib.util.spec_from_file_location(
        "gen_counts", os.path.join(REPO, "tools", "gen_counts.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_counts_in_sync():
    gc = _gen_counts()
    c = gc.live_counts()
    rendered = gc.render(c)
    drifted = [
        os.path.basename(p)
        for p, s in rendered.items()
        if open(p).read() != s
    ]
    assert not drifted, (
        f"headline counts drifted in {drifted} (live: {c}); "
        "run `python tools/gen_counts.py` and commit"
    )


def test_counts_are_plausible():
    """The emitter's sources themselves: registry non-empty, every
    oracle-backed query is registered, plan sections and sweep ops in
    the same order of magnitude as the registry."""
    gc = _gen_counts()
    c = gc.live_counts()
    assert c["queries"] == c["oracle"] + c["rows_only"]
    assert c["queries"] > 400
    assert c["plans"] > 200
    assert c["sweep_10x"] >= 139 and c["sweep_sf1_sf2"] >= 110
