"""Reference-mount parity suite — SKIPS while /root/reference is empty.

The reference mount has held zero files at every check since SURVEY time
(SURVEY.md §0; VERDICT r3 reconfirmed). The moment it populates, this module
stops skipping and mechanically diffs the real `linearcorex` package against
the repo's float64 oracle (the stand-in spec, SURVEY.md §0.1): anchor
locations, the [MED]-confidence constants (anneal schedule, rho clip), and
seed-matched converged fits on scaled versions of the 5 BASELINE configs.

Driver: `tools/recite.py` (same functions, CLI form + full JSON report).
CLAUDE.md quick-start step 1 points here.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import recite  # noqa: E402  (tools/recite.py)

if not recite.reference_populated():
    pytest.skip(
        "reference mount /root/reference is empty (every check since "
        "survey time — SURVEY.md §0); populate it and re-run to diff the "
        "oracle against the real package",
        allow_module_level=True)


@pytest.fixture(scope="module")
def ref_mod():
    mod = recite.import_reference()
    if mod is None:
        pytest.fail(
            "/root/reference is populated but the linearcorex package "
            "does not import from it — run `python tools/recite.py` for "
            "the inventory and fix import_reference's search paths")
    return mod


def test_anchors_resolve():
    """Every `[U] :: <symbol>` anchor this repo cites must exist in the
    real source; failures list exactly which citations are fiction."""
    hits = recite.find_anchors()
    core = ["class Corex", "Corex.fit", "preprocess", "get_covariance",
            "discourage_overlap"]
    missing = [a for a in core if not hits[a]]
    assert not missing, (
        f"reference populated but core anchors not found: {missing} — "
        f"the repo's [U] citations need re-derivation (SURVEY.md §0.2)")


def test_constants_match_oracle():
    """The [MED] internals (0.6**k schedule, rho clip) extracted from the
    real source must not conflict with what the oracle implements."""
    report = recite.extract_constants()
    divergent = {k: v for k, v in report.items()
                 if isinstance(v, dict) and v.get("diverges")}
    assert not divergent, (
        f"reference constants diverge from the oracle: {divergent} — "
        f"update linearcorex_tpu/oracle/oracle.py (the executable spec) "
        f"first, then re-run tests/test_parity.py against the TPU path")


def test_seed_matched_behavior(ref_mod):
    """Converged-state agreement on the scaled 5-config suite: TC within
    5%, identical cluster partitions, close covariance estimates. Shared
    explicit initial weights rule out RNG-difference explanations."""
    results = recite.behavior_diff(ref_mod)
    errors = [r for r in results if "error" in r]
    assert not errors, (
        f"reference fits failed to run: {errors} — the upstream ctor "
        f"surface differs from SURVEY.md §1 L5; adjudicate by hand")
    divergent = [r for r in results if r.get("diverges")]
    assert not divergent, (
        f"oracle-vs-reference divergence on converged fits: {divergent} "
        f"— the likeliest culprits are the _update_ws form and the v_i "
        f"Q-correction (SURVEY.md §2.5, §7.0); fix the oracle, then "
        f"re-run the full parity suite")
