"""Reconstruct Catalyst's ``TreeNode.toJSON`` flat pre-order encoding into
nested python trees — for both logical-plan nodes and expression trees.

Catalyst serializes a tree as a flat JSON array in pre-order where each node
carries ``num-children``; expression-valued fields hold either one flattened
expression tree (list of dicts) or a list of flattened trees (list of lists).
"""

from __future__ import annotations

from typing import Any

Node = dict[str, Any]


def build_tree(flat: list[Node]) -> Node:
    """Nest a flat pre-order node list; children land under '_children'."""
    it = iter(flat)

    def rec() -> Node:
        node = next(it)
        node["_children"] = [rec() for _ in range(node.get("num-children", 0))]
        return node

    root = rec()
    return root


def cls_name(node: Node) -> str:
    return node["class"].rsplit(".", 1)[-1]


def expr_trees(value: Any) -> list[Node]:
    """Parse an expression-valued plan field into a list of expression trees.

    Shapes seen in Spark 4.x JSON:
      - single flattened tree: [ {class:...}, ... ]
      - list of flattened trees: [ [ {...}, ... ], ... ]
      - None / scalars: no expressions
    """
    if not isinstance(value, list) or not value:
        return []
    if isinstance(value[0], dict) and "class" in value[0]:
        return [build_tree(list(value))]
    out = []
    for item in value:
        if isinstance(item, list) and item and isinstance(item[0], dict) and "class" in item[0]:
            out.append(build_tree(list(item)))
    return out


def expr_id(node: Node) -> tuple[str, int] | None:
    e = node.get("exprId")
    if not isinstance(e, dict):
        return None
    return (e.get("jvmId", ""), e["id"])
