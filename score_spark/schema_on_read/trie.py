"""Requirement trie: which nested paths of each source relation a query needs.

Rebuild of the reference's SchemaElement trie
(/root/reference/score/src/main/java/com/taboola/spark/sql/score/SchemaElementImpl.java:13-114)
with the same semantics, re-keyed on Catalyst exprIds instead of re-parsed SQL
strings:

- node per touched schema path, name-matched case-insensitively
  (SchemaOnReadState.java:162-184), original case re-emitted from the source
  schema;
- sticky `required` flag (SchemaElementImpl.java:112-114): once a node is
  required (grouping/sort/join/window keys, or any column output by an
  upper-most selection node) its FULL subtree is kept;
- touched-but-not-required complex nodes prune to their touched children, or
  collapse to a skeleton (empty struct / array-of-skeleton / map-of-skeleton,
  SchemaElementImpl.java:53-77) when structurally needed but never read into;
- array and map layers are transparent: children of an array<struct> node are
  the element's fields, children of a map node are the *value* type's fields;
  map keys are never pruned (test SchemaOnReadGeneratorTest.java:1299-1332);
- primitives are always kept once touched (SchemaElementImpl.java:46-51).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_COMPLEX = (T.StructType, T.ArrayType, T.MapType)


def is_complex(dtype: T.DataType) -> bool:
    return isinstance(dtype, _COMPLEX)


@dataclass
class TrieNode:
    """Pure name trie: nodes carry only the sticky ``required`` flag and
    touched children. All TYPES come from the actual source schema at
    emission time (prune_schema / prune_type) — a per-node dtype was
    carried and resolved here for nothing (review r9: no consumer ever
    read it for a decision), costing an O(#fields) scan per child creation
    on the analyze path."""

    required: bool = False
    children: dict[str, TrieNode] = field(default_factory=dict)

    def child(self, name: str) -> TrieNode:
        """Get-or-create the child for a (lower-cased) field name."""
        key = name.lower()
        node = self.children.get(key)
        if node is None:
            node = TrieNode()
            self.children[key] = node
        return node

    def require(self) -> None:
        self.required = True


@dataclass
class StructSynthNode(TrieNode):
    """Virtual node for a CONSTRUCTED struct (CreateNamedStruct, r11):
    ``children`` maps the constructed field names to the REAL trie nodes of
    the value expressions (shared references — the same mechanism as alias
    clones). Never part of any relation trie, so it is never emitted;
    descents through the construction land on the real value nodes, and
    requiring the constructed value fans out to every mapped value's full
    subtree (a plain TrieNode.require would mark only this detached node,
    silently keeping nothing — the r11 probe's `struct(s1, n) AS s2;
    SELECT s2` returned Row() for s1)."""

    def require(self) -> None:
        self.required = True
        for c in self.children.values():
            c.require()


@dataclass
class FanNode(TrieNode):
    """Virtual node fanning trie operations over several real nodes — a
    constructed-struct value whose expression resolved to MULTIPLE handles
    (set-op linked aliases). Descending creates a fan over each member's
    same-named child; requiring requires every member."""

    members: list[TrieNode] = field(default_factory=list)

    def child(self, name: str) -> TrieNode:
        key = name.lower()
        node = self.children.get(key)
        if node is None:
            node = FanNode(members=[m.child(name) for m in self.members])
            self.children[key] = node
        return node

    def require(self) -> None:
        self.required = True
        for m in self.members:
            m.require()


@dataclass(frozen=True)
class Handle:
    """A (node, pending-child-name) pointer into the trie. ``name=None`` means
    the node itself. Materializing a pending child *touches* the path — the
    analog of the reference's addColumn trie insertion
    (SchemaOnReadState.java:155-189). Handles are shared by reference, which
    reproduces the alias shared-state clone semantics
    (SchemaElementImpl.java:37-43): requirements discovered via an alias
    propagate to the original path."""

    node: TrieNode
    name: str | None = None

    def materialize(self) -> TrieNode:
        if self.name is None:
            return self.node
        return self.node.child(self.name)

    def descend(self, field_name: str) -> Handle:
        return Handle(self.materialize(), field_name.lower())


def merge_requirements(nodes: list[TrieNode]) -> bool:
    """Union the requirement subtrees of trie nodes that feed the same
    set-op output position, in place, so every branch emits the same pruned
    shape (generator._merge_setop_groups has the why). Sticky ``required``
    propagates to all; otherwise the touched-children sets merge
    recursively. Types never enter the merge — each branch's pruned schema
    is intersected with its OWN source schema at emission.
    Returns True when anything changed (the caller iterates to fixpoint)."""
    changed = False
    if any(n.required for n in nodes):
        for n in nodes:
            if not n.required:
                n.require()
                changed = True
        # required keeps the full subtree at emission; children are moot
        return changed
    names: set[str] = set()
    for n in nodes:
        names.update(n.children)
    for name in sorted(names):
        kids = []
        for n in nodes:
            if name not in n.children:
                changed = True
            kids.append(n.child(name))
        if merge_requirements(kids):
            changed = True
    return changed


def skeleton(dtype: T.DataType) -> T.DataType:
    """Structurally-needed-but-unread complex type
    (SchemaElementImpl.java:53-77; visible in reference tests :694-697)."""
    if isinstance(dtype, T.StructType):
        return T.StructType([])
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(skeleton(dtype.elementType), dtype.containsNull)
    if isinstance(dtype, T.MapType):
        return T.MapType(dtype.keyType, skeleton(dtype.valueType), dtype.valueContainsNull)
    return dtype


def prune_type(dtype: T.DataType, node: TrieNode) -> T.DataType:
    """Intersect a full type with a trie node — the rebuild of subSchema
    recursion (SchemaOnReadExtractor.java:85-136)."""
    if node.required or not is_complex(dtype):
        return dtype
    if not node.children:
        return skeleton(dtype)
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(prune_type(dtype.elementType, node), dtype.containsNull)
    if isinstance(dtype, T.MapType):
        # keys are never pruned — only the value side narrows
        return T.MapType(dtype.keyType, prune_type(dtype.valueType, node), dtype.valueContainsNull)
    assert isinstance(dtype, T.StructType)
    fields = []
    for f in dtype.fields:
        child = node.children.get(f.name.lower())
        if child is not None:
            fields.append(T.StructField(f.name, prune_type(f.dataType, child), f.nullable, f.metadata))
    if not fields:
        # touched children exist but none matched this struct (shape drift):
        # best-effort → keep full (README.md:9)
        return dtype
    return T.StructType(fields)


def prune_schema(full: T.StructType, root: TrieNode) -> T.StructType:
    """Emit the pruned read-schema for one relation. Empty trie → caller falls
    back to the full schema (SchemaOnReadExtractor.java:154-158)."""
    fields = []
    for f in full.fields:
        child = root.children.get(f.name.lower())
        if child is not None:
            fields.append(T.StructField(f.name, prune_type(f.dataType, child), f.nullable, f.metadata))
    return T.StructType(fields)
