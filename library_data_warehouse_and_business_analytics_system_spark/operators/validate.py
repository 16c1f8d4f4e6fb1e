"""CHECK-constraint semantics for Spark (SURVEY.md §1.3).

The reference enforces domains at write time via CHECK constraints and
RAISE_APPLICATION_ERROR triggers (01_Create.sql passim,
02_Trigger.sql:23,156,186-192). Spark has no declarative CHECK, so we
validate as an explicit operator: evaluate every rule in ONE pass
(no per-rule job), returning per-rule violation counts — the same
single-scan trick a 100 TB audit needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RuleViolation:
    rule: str
    violations: int


class ConstraintError(ValueError):
    def __init__(self, table: str, violations: list[RuleViolation]):
        self.table = table
        self.violations = violations
        detail = ", ".join(f"{v.rule}={v.violations}" for v in violations)
        super().__init__(f"CHECK violations in {table}: {detail}")


def check_counts(df: DataFrame, rules: list[tuple[str, str]]) -> list[RuleViolation]:
    """Count violations of each (name, sql_predicate) rule in one
    aggregate pass over ``df``."""
    aggs = [
        F.sum(F.when(~F.expr(pred), 1).otherwise(0)).alias(name)
        for name, pred in rules
    ]
    row = df.agg(*aggs).collect()[0]
    return [RuleViolation(name, int(row[name] or 0)) for name, _ in rules]


def validate(df: DataFrame, rules: list[tuple[str, str]], table: str = "df",
             raise_on_violation: bool = True) -> list[RuleViolation]:
    """Validate ``df`` against CHECK rules; raise (like the reference's
    constraint rejection) or return the violation report."""
    report = check_counts(df, rules)
    bad = [v for v in report if v.violations > 0]
    if bad and raise_on_violation:
        raise ConstraintError(table, bad)
    return report


def expectation_report(df: DataFrame, table: str,
                       rules: list[tuple[str, str]]) -> DataFrame:
    """Lazy per-rule expectation summary as a DataFrame: one row per
    rule with (check_name, n_checked, n_violations, passed).

    Unlike :func:`check_counts` this never collects — it composes
    into a UNION of per-table reports (``dq_expectations_summary``)
    and still evaluates all of one table's rules in a single
    aggregate pass. NULL predicates pass (Oracle CHECK semantics).
    """
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.when(~F.coalesce(F.expr(pred), F.lit(True)), 1)
              .otherwise(0)).cast("bigint").alias(f"_v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    per_rule = F.array(*[
        F.struct(F.lit(f"{table}.{name}").alias("check_name"),
                 F.col("_n").cast("bigint").alias("n_checked"),
                 F.col(f"_v{i}").alias("n_violations"))
        for i, (name, _) in enumerate(rules)
    ])
    return (
        wide.select(F.explode(per_rule).alias("r"))
        .select("r.check_name", "r.n_checked", "r.n_violations",
                (F.col("r.n_violations") == 0).alias("passed"))
    )


def fk_report(child: DataFrame, fk_col: str, parent: DataFrame,
              pk_col: str, check_name: str) -> DataFrame:
    """Referential-integrity expectation: count child rows whose
    non-NULL FK has no parent. The orphan count is a left-anti join
    on the key — a shuffle (or AQE-chosen broadcast) equi-join, the
    plan a 100 TB audit wants; NULL FKs pass, as in Oracle.
    """
    n = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_checked"))
    orphans = (
        child.filter(F.col(fk_col).isNotNull())
        .join(parent.select(F.col(pk_col).alias(fk_col)).distinct(),
              fk_col, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )
    return (
        n.crossJoin(orphans)
        .select(F.lit(check_name).alias("check_name"), "n_checked",
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"))
    )


def quarantine(df: DataFrame, rules: list[tuple[str, str]]) -> tuple[DataFrame, DataFrame]:
    """Split df into (valid, rejected) — the scale-friendly alternative
    to failing the whole load when a handful of rows are bad.

    A rule predicate that evaluates to NULL PASSES (Oracle CHECK
    semantics, same as check_counts) — each conjunct is coalesced to
    TRUE so ``ok`` is never NULL and valid + rejected is exactly the
    input (a bare three-valued ``ok`` would drop NULL-predicate rows
    from both sides)."""
    ok = F.lit(True)
    for _, pred in rules:
        ok = ok & F.coalesce(F.expr(pred), F.lit(True))
    return df.filter(ok), df.filter(~ok)
