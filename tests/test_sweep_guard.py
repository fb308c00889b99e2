"""Guard: the committed local-sweep artifact must cover every registered
query (VERDICT r5 item 5 — r5's CHECK_LOCAL header claimed "every
registered query" while 20 late additions were missing from its body;
this turns that judge finding into a failing test).

The newest CHECK_LOCAL_r*.md must contain a PASS/ok line for each name in
the registry, and no FAIL lines. Adding a query without re-running
``tools/check.py`` (full, or incrementally appending the new names'
lines) makes this test fail — which is the intended forcing function.
"""

from __future__ import annotations

import glob
import os
import re

import oe_batch_processing_spark.operators  # noqa: F401
from oe_batch_processing_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_sweep() -> str:
    paths = glob.glob(os.path.join(REPO, "CHECK_LOCAL_r*.md"))
    assert paths, "no CHECK_LOCAL_r*.md sweep artifact committed"
    return max(paths, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))


def test_sweep_covers_every_registered_query():
    path = _newest_sweep()
    with open(path) as f:
        body = f.read()
    covered = set(re.findall(r"^(?:PASS|ok)\s+(\w+):", body, re.MULTILINE))
    missing = sorted(set(registry.QUERIES) - covered)
    assert not missing, (
        f"{os.path.basename(path)} lacks a sweep line for {len(missing)} "
        f"registered queries: {missing[:10]}{'...' if len(missing) > 10 else ''} "
        f"— run tools/check.py on them and append/regenerate the artifact"
    )


def test_sweep_has_no_recorded_failures():
    with open(_newest_sweep()) as f:
        fails = [ln for ln in f if ln.startswith("FAIL ")]
    assert not fails, f"sweep artifact records failures: {fails[:5]}"


# Oracled queries whose output is legitimately empty at the CONTRACT scale
# (sf0.01), each with a reason. Empty-vs-empty is a vacuous check (round-6
# verdict: the m=2^16 bloom prefilter passed 6 rounds of sweeps that way),
# so any new name landing here must argue its case — ideally by also
# carrying a non-contract-SF or unit-test exercise of the non-empty path.
VACUOUS_ALLOWLIST: dict[str, str] = {}


def test_sweep_vacuous_passes_are_allowlisted():
    """tools/check.py marks oracled 0-row passes as ``PASS name: 0 rows
    (VACUOUS)``; every such line in the newest contract-SF sweep must have
    an allowlist entry explaining why 0 rows is the real answer."""
    with open(_newest_sweep()) as f:
        body = f.read()
    vacuous = set(re.findall(r"^PASS\s+(\w+): 0 rows \(VACUOUS\)", body, re.MULTILINE))
    unjustified = sorted(vacuous - set(VACUOUS_ALLOWLIST))
    assert not unjustified, (
        f"oracled queries pass vacuously (0 rows == 0 rows) at the contract "
        f"SF with no allowlist justification: {unjustified} — make the "
        f"output non-empty at sf0.01, add a unit test of the non-empty "
        f"path, or justify an allowlist entry"
    )
