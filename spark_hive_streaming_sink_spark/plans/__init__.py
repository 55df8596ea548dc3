"""Physical-plan inspection helpers: the engine's scale guarantees
(pushdown, pruning, broadcast selection, top-k rewrites, shuffle
counts) are asserted in tests/test_plans.py via these, so a regression
that silently degrades a plan (e.g. a broadcast falling back to
sort-merge, a filter failing to reach the scan) fails CI rather than
surfacing as a 100× slowdown at cluster scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """explain("formatted") as a string (what .explain prints)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def count_nodes(df: DataFrame, node: str) -> int:
    """Count physical nodes by their detail headers ``(N) NodeName`` —
    the tree rendering repeats each node, so a raw substring count
    double-counts."""
    return len(re.findall(rf"^\(\d+\)\s+{re.escape(node)}", formatted_plan(df), re.M))


def pushed_filters(df: DataFrame) -> list[str]:
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    ]


def read_schemas(df: DataFrame) -> list[str]:
    return [
        line.strip() for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    ]


def executed_final_plan(df: DataFrame) -> str:
    """Execute the DataFrame (collect) and return the FINAL adaptive
    plan string. Needed for runtime-only facts — AQE applies exchange
    reuse when shuffle query stages materialize, so ``ReusedExchange``
    only appears after execution (an unexecuted adaptive plan prints
    every self-join subtree twice even when one side will be reused)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "plan did not finalize under AQE"
    # AdaptiveSparkPlan.toString appends the pre-execution "Initial
    # Plan" section, which duplicates every subtree reuse collapsed —
    # return only the final (actually executed) section.
    return plan.split("== Initial Plan ==")[0]


def bnlj_build_subtrees(df: DataFrame) -> list[str]:
    """The BroadcastExchange child subtree of every
    BroadcastNestedLoopJoin in the physical plan tree — the relation
    that actually gets broadcast and nested-loop-probed.

    Used to enforce the 100 TB NLJ policy (r14, per the r13 advisor):
    counting BNLJ nodes alone cannot distinguish the benign 1-row
    packed-centroid/codebook broadcasts (an Aggregate feeds the
    exchange) from a harmful corpus-sized nested loop (a bare scan
    feeds it), so tests assert on the build side's SHAPE instead."""
    tree = formatted_plan(df).split("\n\n")[0].splitlines()

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-*"))

    subtrees: list[str] = []
    for i, line in enumerate(tree):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        d = indent(line)
        sub: list[str] = []
        for nxt in tree[i + 1 :]:
            if indent(nxt) <= d:
                break
            sub.append(nxt)
        if not sub:
            continue
        child_indent = min(indent(l) for l in sub)
        for j, l2 in enumerate(sub):
            if indent(l2) == child_indent and (
                "BroadcastExchange" in l2 or "BroadcastQueryStage" in l2
            ):
                s2 = [l2]
                for nxt in sub[j + 1 :]:
                    if indent(nxt) <= child_indent:
                        break
                    s2.append(nxt)
                subtrees.append("\n".join(s2))
    return subtrees


def broadcast_hint_subtrees(df: DataFrame) -> list[str]:
    """Subtree text under each explicit broadcast hint in the ANALYZED
    logical plan (i.e. every ``F.broadcast``/``/*+ BROADCAST */`` the
    query author wrote — before the optimizer folds hints into joins).

    Used to enforce the 100 TB broadcast policy: a static hint pins the
    build side regardless of runtime size (AQE cannot demote it), so
    hints are only allowed on inputs whose size is invariant in the
    scale factor — fixed spec tables (nation/region) or the output of
    an Aggregate/Limit."""
    text = df._jdf.queryExecution().analyzed().toString()
    lines = text.splitlines()
    subtrees: list[str] = []

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-"))

    for i, line in enumerate(lines):
        if "ResolvedHint" in line and "broadcast" in line.lower():
            d = indent(line)
            sub = []
            for nxt in lines[i + 1 :]:
                if nxt.strip() and indent(nxt) <= d:
                    break
                sub.append(nxt)
            subtrees.append("\n".join(sub))
    return subtrees
