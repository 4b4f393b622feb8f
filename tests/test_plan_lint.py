"""Registry-wide plan lint: every harness query's optimized plan is free
of cartesian products, row-at-a-time Python UDFs, and fact-scale
single-partition funnels — or carries an explicit, justified exemption
in tools/plan_lint.py. The generalization of the hand-picked audits in
test_plans.py to ALL queries, so a new query can't silently regress the
scale discipline.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from gfw_pixetl_spark import harness
from tests.conftest import SF_SMOKE
from tools.plan_lint import EXEMPTIONS, lint_plan


@pytest.mark.parametrize("name", sorted(harness.QUERIES))
def test_plan_is_clean(name, spark):
    df = harness.QUERIES[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    flags = lint_plan(name, buf.getvalue())
    exempt = EXEMPTIONS.get(name, {})
    bad = {rule: msg for rule, msg in flags.items() if rule not in exempt}
    assert not bad, f"{name}: {bad} (add a justified exemption or fix the plan)"
