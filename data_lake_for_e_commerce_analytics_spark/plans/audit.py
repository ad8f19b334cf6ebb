"""Mechanical 100 TB plan screens (VERDICT r10 task 4).

The UDF/collect screen (tests/test_plan_audit.py) caught row-Python and
cartesian products for four rounds but missed two plan-level
scale-killers that are CHEAP at bench scale and fatal at 100 TB:

- an unpartitioned window (``Exchange SinglePartition`` feeding a
  ``Window``) whose input is NOT a bounded aggregate — one task sorts
  the whole relation (r10: ``order_value_equidepth``, ``rfm_segments``);
- an explicit ``F.broadcast`` hint on a relation whose cardinality
  tracks a FACT table — a multi-GB broadcast that OOMs executors
  (r10: ``bm25_topk`` broadcasting the per-document length relation).

Both are now detected from the plan STRINGS, so every registered query
is screened automatically. The detectors parse Spark's indented tree
format (one node per line, ``+-``/``:-`` child markers, indent depth =
tree depth) rather than substring-matching, because both rules are
about SUBTREES: the same ``Exchange SinglePartition`` is legal over a
10^4-row census aggregate and fatal over a fact scan.

Boundedness rule (shared by both screens): a subtree is bounded when
every leaf-to-root path crosses a cardinality-bounding node — a
LIMIT/top-k (``GlobalLimit``/``CollectLimit``/``TakeOrderedAndProject``),
a ``Sample``, or an aggregate whose grouping keys contain NO
fact-cardinality id. Ids that track fact rows (``doc_id``, ``vec_id``,
``o_orderkey``, ``l_orderkey``, ``o_custkey``/``c_custkey``,
``user_id``, ``event_id``, ``session_id``) never bound: grouping by
them re-emits (nearly) one row per fact row. Grouping by a census /
bucket / term / language / partition-id key does bound — that is the
whole point of the bucket-census pattern (``text.py``,
``distributed_rank.py``).

Star-schema note: the broadcast screen keys on FACT leaves (orders,
lineitem, events, documents, embeddings — recognized by their id
columns). Hinted broadcasts of the dimension tables
(nation/region/customer/part/supplier) are the J1/J3 star-join
contract this engine plan-asserts elsewhere; at a scale where a
dimension stops fitting in memory the hint is a config decision, not a
per-query plan bug, and AQE's size check is the runtime guard.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# ids whose distinct cardinality tracks fact-table row counts
FACT_IDS = (
    "doc_id",
    "vec_id",
    "o_orderkey",
    "l_orderkey",
    "o_custkey",
    "c_custkey",
    "user_id",
    "p_user_id",
    "event_id",
    "session_id",
)

# leaf relations that ARE fact tables (or row-per-fact-row derivations),
# recognized by the id columns they expose
_FACT_LEAF_RE = re.compile(
    r"\b(doc_id|vec_id|o_orderkey|l_orderkey|event_id)#"
)

_BOUNDING_PREFIXES = (
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "TakeOrderedAndProject",
    "Limit",
    "Sample",
)

# nodes an Exchange's output flows through on its way into a Window
_WINDOW_PASSTHROUGH = (
    "Sort",
    "Project",
    "Filter",
    "WindowGroupLimit",
    "InputAdapter",
    "WholeStageCodegen",
)


@dataclass
class _Node:
    depth: int
    text: str
    parent: "_Node | None" = None
    children: list = field(default_factory=list)


def parse_plan_tree(plan: str) -> list[_Node]:
    """Parse Spark's toString() tree (physical or logical) into nodes
    with parent/children links. Depth comes from the ``+-``/``:-``
    marker column; the header line is the root at depth -1."""
    nodes: list[_Node] = []
    stack: list[_Node] = []
    for line in plan.splitlines():
        if not line.strip():
            continue
        m = re.match(r"^([ :|]*)[+:]-\s?(.*)$", line)
        if m:
            depth, text = len(m.group(1)), m.group(2)
        elif not nodes:
            depth, text = -1, line.strip()
        else:
            # wrapped continuation of the previous node's single line
            nodes[-1].text += " " + line.strip()
            continue
        node = _Node(depth, text)
        while stack and stack[-1].depth >= depth:
            stack.pop()
        if stack:
            node.parent = stack[-1]
            stack[-1].children.append(node)
        stack.append(node)
        nodes.append(node)
    return nodes


def _keys_are_bounded(keys: str) -> bool:
    return not any(re.search(rf"\b{i}#", keys) for i in FACT_IDS)


def _is_bounding(node: _Node) -> bool:
    t = node.text
    if t.startswith(_BOUNDING_PREFIXES):
        return True
    m = re.match(r"(?:Hash|Sort|ObjectHash)Aggregate\(keys=\[([^\]]*)\]", t)
    if m:
        return _keys_are_bounded(m.group(1))
    # logical Aggregate: "Aggregate [keys], [out]" (grouped) or
    # "Aggregate [out]" (scalar — one bracket group, always bounded)
    m = re.match(r"Aggregate \[([^\]]*)\](, \[)?", t)
    if m:
        return m.group(2) is None or _keys_are_bounded(m.group(1))
    if t.startswith("Deduplicate"):
        m = re.match(r"Deduplicate \[([^\]]*)\]", t)
        return bool(m) and _keys_are_bounded(m.group(1))
    # a Filter that pins a fact id to literals bounds the subtree:
    # `vec_id#207L INSET 0, 124, ...` (the 16 ANN gate queries),
    # `vec_id#9L < 8` (a literal id-range sample), `doc_id#3L = 7`.
    # A transforming predicate like `(doc_id#178L % 2) = 1` does NOT
    # match — the id must be compared directly against the literal.
    if t.startswith("Filter"):
        ids = "|".join(FACT_IDS)
        return bool(
            re.search(rf"\b(?:{ids})#\d+L? (?:INSET\b|IN \(|(?:<|<=|=) \d)", t)
        )
    return False


def _unbounded_leaf(root: _Node) -> str | None:
    """First leaf under ``root`` reachable without crossing a bounding
    node (root itself excluded), or None if every path is bounded."""
    stack = [root]
    while stack:
        n = stack.pop()
        for c in n.children:
            if _is_bounding(c):
                continue
            if c.children:
                stack.append(c)
            else:
                return c.text
    return None


def single_partition_window_flags(physical_plan: str) -> list[str]:
    """Flag every ``Exchange SinglePartition`` that (a) feeds a Window
    through pass-through operators and (b) has an unbounded input
    subtree. Returns human-readable findings (empty = clean)."""
    flags: list[str] = []
    for node in parse_plan_tree(physical_plan):
        if not node.text.startswith("Exchange SinglePartition"):
            continue
        anc, feeds_window = node.parent, False
        while anc is not None:
            if anc.text.startswith("Window"):
                feeds_window = True
                break
            if not anc.text.startswith(_WINDOW_PASSTHROUGH):
                break
            anc = anc.parent
        if not feeds_window:
            continue
        leaf = _unbounded_leaf(node)
        if leaf is not None:
            flags.append(
                "Exchange SinglePartition feeds a Window over an unbounded "
                f"input (leaf: {leaf[:120]})"
            )
    return flags


def unbounded_broadcast_flags(optimized_plan: str) -> list[str]:
    """Flag every explicit broadcast HINT (leftHint/rightHint =
    strategy=broadcast in the optimized logical plan — AQE's own
    runtime choices carry no hint and are not flagged) whose hinted
    side reaches a FACT-table leaf without a bounding node."""
    flags: list[str] = []
    for node in parse_plan_tree(optimized_plan):
        if "Hint=(strategy=broadcast" not in node.text:
            continue
        sides = []
        if "leftHint=(strategy=broadcast" in node.text and node.children:
            sides.append(node.children[0])
        if "rightHint=(strategy=broadcast" in node.text and node.children:
            sides.append(node.children[-1])
        for side in sides:
            if _is_bounding(side):
                continue
            leaf = _unbounded_leaf(side)
            if leaf is not None and _FACT_LEAF_RE.search(leaf):
                flags.append(
                    "explicit F.broadcast of a fact-cardinality relation "
                    f"(leaf: {leaf[:120]})"
                )
    return flags


def audit_dataframe(df: DataFrame) -> list[str]:
    """Both screens over one DataFrame's plans."""
    qe = df._jdf.queryExecution()
    return single_partition_window_flags(
        qe.executedPlan().toString()
    ) + unbounded_broadcast_flags(qe.optimizedPlan().toString())
