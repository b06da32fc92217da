"""Physical-plan linter — the automated 100 TB smell test.

Walks the formatted physical plan of a DataFrame and reports the
constructs that are fine at sf0.01 and fatal at scale:

  cartesian       CartesianProduct / BroadcastNestedLoopJoin — O(n*m)
                  pair generation; at scale this is a non-plan unless
                  the semantics genuinely are cartesian (join_cross)
                  or one side is a 1-row aggregate (scalar subquery).
  single-partition-exchange
                  `Exchange SinglePartition` — the whole dataset
                  funnels through one task. Legitimate only when the
                  input is already a tiny aggregate (a global 1-row
                  agg, a per-bucket offset table, a LIMIT head).
  rowwise-python-udf
                  BatchEvalPython / PythonUDTF — row-at-a-time Python
                  in the hot path (~10-100x slower than Arrow). The
                  two registry keys whose PURPOSE is covering that
                  API are allowlisted; nothing else may use it.
  global-sort     A range-partitioned full Sort that is not followed
                  by a limit (TakeOrderedAndProject is fine). Often
                  intentional (sorted output); flagged so the intent
                  is explicit.

Usage:
    from dags_spark.plans import lint_plan
    for f in lint_plan(df):
        print(f.code, f.node)

`tests/test_plan_lint.py` sweeps EVERY registered batch query and
fails if a finding appears outside the per-key allowlist — so a
refactor that silently degrades any of the 150 plans fails CI, not
the cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    code: str
    node: str


def _formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def lint_plan(df: DataFrame) -> list[Finding]:
    """Lint the (pre-AQE) physical plan; returns [] for a clean plan."""
    plan = _formatted(df)
    findings: list[Finding] = []
    lines = plan.splitlines()
    tree_end = next(
        (i for i, l in enumerate(lines) if not l.strip()), len(lines)
    )
    tree = lines[:tree_end]

    def hit(code: str, line: str) -> None:
        findings.append(Finding(code, line.strip().lstrip("+-:* ")))

    sort_idxs: list[int] = []
    for i, line in enumerate(tree):
        if "CartesianProduct" in line or "BroadcastNestedLoopJoin" in line:
            hit("cartesian", line)
        if "BatchEvalPython" in line or "PythonUDTF" in line:
            hit("rowwise-python-udf", line)
        if " Sort " in f" {line} " or line.strip().startswith("Sort "):
            sort_idxs.append(i)

    # SinglePartition exchanges live in the detail section as
    # "Arguments: SinglePartition".
    for i, line in enumerate(lines):
        if "Arguments: SinglePartition" in line:
            # walk back to the node header "(N) Exchange"
            for j in range(i, max(i - 6, -1), -1):
                if lines[j].startswith("(") and "Exchange" in lines[j]:
                    hit("single-partition-exchange", lines[j])
                    break

    # Global sort: Sort node fed by a rangepartitioning Exchange and
    # no TakeOrderedAndProject/Limit in the tree.
    if sort_idxs and "rangepartitioning" in plan and not any(
        "TakeOrdered" in l or "GlobalLimit" in l for l in tree
    ):
        hit("global-sort", tree[sort_idxs[0]])

    return findings
