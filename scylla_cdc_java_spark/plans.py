"""Physical/logical plan audit — the anti-pattern sweep as a library.

The per-query guards in tests/test_plans.py pin *specific* shapes
(pushdown reached the scan, a join stayed broadcast). This module is the
UNIVERSAL floor under every registered query: no plan may cartesian, no
hot path may fall back to row-at-a-time Python, nested-loop broadcasts
and user broadcast hints are allowed only where a recorded per-query
allowance says a bounded-size frame justifies them. tests/test_plans.py
runs it over the whole QUERIES registry, so a refactor that sneaks a
hinted broadcast of a corpus-sized frame (or loses an equi-join
condition) fails CI instead of OOMing a driver at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def audit_plan(
    df: DataFrame,
    max_hints: int = 0,
    allow_bnlj: bool = False,
) -> list[str]:
    """Return the list of scale anti-patterns in ``df``'s plan (empty =
    clean).

    * ``CartesianProduct`` — never acceptable;
    * ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (Arrow
      kernels surface as MapInPandas/FlatMapGroupsIn* and are fine);
    * ``BroadcastNestedLoopJoin`` — only with ``allow_bnlj`` (legitimate
      for crossJoin of a 1-row aggregate, the documented pattern);
    * user ``ResolvedHint`` count above ``max_hints`` — each allowed hint
      is a recorded decision that the hinted frame is bounded (query
      vectors, probe tables, k-row LUTs), so a NEW hint fails the audit
      until someone proves its frame cannot grow with the corpus.
    """
    qe = df._jdf.queryExecution()
    analyzed = str(qe.analyzed())
    executed = str(qe.executedPlan())
    problems: list[str] = []
    if "CartesianProduct" in executed:
        problems.append("CartesianProduct in physical plan")
    if "BatchEvalPython" in executed:
        problems.append("row-at-a-time Python UDF (BatchEvalPython)")
    if not allow_bnlj and "BroadcastNestedLoopJoin" in executed:
        problems.append("BroadcastNestedLoopJoin without an allowance")
    hints = analyzed.count("ResolvedHint")
    if hints > max_hints:
        problems.append(
            f"{hints} broadcast/join hints, allowance is {max_hints}"
        )
    return problems
