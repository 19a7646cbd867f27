"""Plan-inspection utilities: extract the scale-relevant physical-plan
facts (exchanges, broadcasts, pushed filters, scan schemas) from a
DataFrame so users — and the regression suite — can assert on plan SHAPE
instead of eyeballing ``explain()`` output.

These read the same strings ``df.explain("formatted")`` prints; nothing
here executes the plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text, returned instead of printed."""
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "formatted")


@dataclass
class PlanSummary:
    """The facts that decide whether a plan survives a 100× scale-up."""

    n_shuffle_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    has_cartesian_product: bool = False
    has_sort_merge_join: bool = False
    shuffle_keysets: set = field(default_factory=set)
    pushed_filters: list = field(default_factory=list)
    read_schemas: list = field(default_factory=list)

    def assert_no_cartesian(self) -> "PlanSummary":
        assert not self.has_cartesian_product, "plan contains CartesianProduct"
        return self

    def assert_max_shuffles(self, n: int) -> "PlanSummary":
        assert self.n_shuffle_exchanges <= n, (
            f"{self.n_shuffle_exchanges} shuffle exchanges (max {n}): "
            f"{sorted(self.shuffle_keysets)}"
        )
        return self


def summarize_plan(df: DataFrame) -> PlanSummary:
    """Parse the formatted plan into a :class:`PlanSummary`."""
    plan = formatted_plan(df)
    s = PlanSummary()
    s.n_broadcast_exchanges = plan.count("BroadcastExchange")
    s.has_cartesian_product = "CartesianProduct" in plan
    s.has_sort_merge_join = "SortMergeJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            s.n_shuffle_exchanges += 1
            m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", line)
            if m:
                keys = re.sub(r"#\d+", "", m.group(1))
                s.shuffle_keysets.add(re.sub(r",\s*\d+$", "", keys))
    s.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    s.read_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    return s
