"""Physical-plan auditing: machine-checkable scale properties.

The 100 TB contract (SURVEY.md §7.4) is only real if the *plans* keep it:
a filter that doesn't reach the Parquet reader re-scans the full fact table;
a dimension join that misses its broadcast shuffles 100 TB; a scan that reads
all columns for a 2-column projection wastes I/O proportional to table width.
These helpers parse ``explain("formatted")`` output so tests can assert plan
shape, not just result values — the difference between "works on 60k rows"
and "would still work on a 1000-executor cluster".
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain string (what ``df.explain('formatted')`` prints)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@dataclass
class PlanAudit:
    """Parsed scale-relevant facts from one physical plan."""

    text: str
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[list[str]] = field(default_factory=list)
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffled_hash_joins: int = 0
    n_nested_loop_joins: int = 0
    n_exchanges: int = 0
    has_take_ordered: bool = False

    @classmethod
    def of(cls, df: DataFrame) -> "PlanAudit":
        text = explain_formatted(df)
        pushed: list[str] = []
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
            if m.group(1).strip():
                pushed.extend(p.strip() for p in m.group(1).split(","))
        part_filters: list[str] = []
        for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", text):
            if m.group(1).strip():
                part_filters.extend(p.strip() for p in m.group(1).split(","))
        schemas = [
            re.findall(r"(\w+):", m.group(1))
            for m in re.finditer(r"ReadSchema: struct<([^\n]*)>", text)
        ]
        return cls(
            text=text,
            pushed_filters=pushed,
            partition_filters=part_filters,
            read_schemas=schemas,
            n_broadcast_joins=text.count("BroadcastHashJoin"),
            n_sortmerge_joins=text.count("SortMergeJoin"),
            n_shuffled_hash_joins=text.count("ShuffledHashJoin"),
            n_nested_loop_joins=text.count("BroadcastNestedLoopJoin"),
            n_exchanges=text.count("Exchange"),
            has_take_ordered="TakeOrderedAndProject" in text,
        )

    # --- assertions used by tests -----------------------------------------

    def assert_filter_pushed(self, column: str) -> None:
        """A predicate on ``column`` reached the Parquet reader."""
        assert any(column in p for p in self.pushed_filters), (
            f"no pushed filter mentions {column!r}; "
            f"pushed={self.pushed_filters}\n{self._scan_lines()}"
        )

    def assert_reads_only(self, table_cols: set[str], allowed: set[str]) -> None:
        """Every scan of a table with ``table_cols`` reads ⊆ ``allowed``.

        Guards column pruning: reading payload columns (e.g. document text)
        in a metadata-only query multiplies scan I/O at corpus scale.
        """
        for schema in self.read_schemas:
            cols = set(schema)
            if cols & table_cols and not cols <= table_cols:
                continue  # scan of some other table
            if cols <= table_cols:
                extra = cols - allowed
                assert not extra, (
                    f"scan reads unneeded columns {sorted(extra)} "
                    f"(allowed {sorted(allowed)})"
                )

    def assert_broadcasts(self, at_least: int = 1) -> None:
        """Dimension joins actually chose broadcast (no dim-side shuffle)."""
        assert self.n_broadcast_joins >= at_least, (
            f"expected ≥{at_least} broadcast joins, found {self.n_broadcast_joins}"
        )

    def assert_no_cartesian(self) -> None:
        """No unconstrained CartesianProduct (bounded BNLJ is acceptable)."""
        assert "CartesianProduct" not in self.text, "plan contains CartesianProduct"

    def _scan_lines(self) -> str:
        return "\n".join(
            ln for ln in self.text.splitlines() if "Scan parquet" in ln
        )
