"""In-UDF AST intermediate representation.

Mirrors the reference's immutable `Ast` IR — a tree of new-node records plus
typed edge lists, with sibling `order` auto-derived (`x2cpg/Ast.scala:44-110`,
order derivation :66-84) — as plain Python objects that exist only inside the
parse UDF before flattening to Arrow rows (SURVEY.md §2.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.hashing import hash64

# Joern synthetic-call operator vocabulary (subset in use; reference
# `Operators.*`, SURVEY.md §2.10 — 125 names, assignment/fieldAccess/... most
# frequent).
OPERATORS = {
    "=": "<operator>.assignment",
    "+=": "<operator>.assignmentPlus",
    "-=": "<operator>.assignmentMinus",
    "*=": "<operator>.assignmentMultiplication",
    "/=": "<operator>.assignmentDivision",
    "%=": "<operator>.assignmentModulo",
    "+": "<operator>.addition",
    "-": "<operator>.subtraction",
    "*": "<operator>.multiplication",
    "/": "<operator>.division",
    "%": "<operator>.modulo",
    "<": "<operator>.lessThan",
    ">": "<operator>.greaterThan",
    "<=": "<operator>.lessEqualsThan",
    ">=": "<operator>.greaterEqualsThan",
    "==": "<operator>.equals",
    "!=": "<operator>.notEquals",
    "&&": "<operator>.logicalAnd",
    "||": "<operator>.logicalOr",
    "!": "<operator>.logicalNot",
    "&": "<operator>.and",
    "|": "<operator>.or",
    "^": "<operator>.xor",
    "<<": "<operator>.shiftLeft",
    ">>": "<operator>.arithmeticShiftRight",
    "u-": "<operator>.minus",
    "u+": "<operator>.plus",
    "u*": "<operator>.indirection",
    "u&": "<operator>.addressOf",
    "~": "<operator>.not",
    "++pre": "<operator>.preIncrement",
    "++post": "<operator>.postIncrement",
    "--pre": "<operator>.preDecrement",
    "--post": "<operator>.postDecrement",
    ".": "<operator>.fieldAccess",
    "->": "<operator>.indirectFieldAccess",
    "[]": "<operator>.indexAccess",
    "?:": "<operator>.conditional",
    "cast": "<operator>.cast",
    "sizeof": "<operator>.sizeOf",
    "new": "<operator>.alloc",
    "delete": "<operator>.delete",
}

STATIC_DISPATCH = "STATIC_DISPATCH"
DYNAMIC_DISPATCH = "DYNAMIC_DISPATCH"

# Placeholder the parser embeds wherever a fragment-scoped FQN needs the
# (url, fragment_idx) qualifier; substituted by flatten().  Keeping parse
# output url-independent makes parse-tree caching by content hash sound.
FRAG_PLACEHOLDER = "\x00FRAG\x00"


@dataclass
class PNode:
    """One prospective CPG node. `children` carry AST edges; the typed extra
    edge lists (argument/condition/receiver/ref) reference child objects."""

    label: str
    name: str = ""
    code: str = ""
    line: int = -1
    col: int = -1
    full_name: str = ""
    signature: str = ""
    method_full_name: str = ""
    type_full_name: str = ""
    dispatch_type: str = ""
    children: list["PNode"] = field(default_factory=list)
    argument_children: list["PNode"] = field(default_factory=list)
    condition_child: "PNode | None" = None
    receiver_child: "PNode | None" = None
    ref_target: "PNode | None" = None  # e.g. IDENTIFIER -> LOCAL
    # recovered-type hints (multi-valued; XTypeHintCallLinker input)
    dynamic_type_hints: list[str] = field(default_factory=list)
    # generic typed edges to other nodes in the same fragment tree
    # (PARAMETER_LINK, BINDS, ... — reference `MethodDecoratorPass.scala:
    # 14-62` PARAMETER_LINK; BINDS via BINDING simplified to direct edge)
    extra_edges: list[tuple[str, "PNode"]] = field(default_factory=list)
    # filled by flatten():
    order: int = 0
    argument_index: int = -1
    id: int = 0
    seq: int = -1

    def add(self, *kids: "PNode | None") -> "PNode":
        for k in kids:
            if k is not None:
                self.children.append(k)
        return self


def flatten(
    root: PNode, url: str, fragment_idx: int, lang: str
) -> tuple[list[dict], list[dict]]:
    """Assign deterministic preorder seq + content-hash ids, derive sibling
    `order` (reference auto-derivation, `Ast.scala:66-84`), and emit
    (node_rows, edge_rows).

    Ids are `hash64(url, fragment_idx, seq)` — computable locally with no
    shared counter, stable across retries (SURVEY.md §1.2/§7.4-1).
    """
    nodes: list[dict] = []
    edges: list[dict] = []
    seq = 0
    frag_key = f"{url}#{fragment_idx}"

    def subst(s: str) -> str:
        return s.replace(FRAG_PLACEHOLDER, frag_key) if FRAG_PLACEHOLDER in s else s

    def assign(n: PNode) -> None:
        nonlocal seq
        n.seq = seq
        n.id = hash64(url, fragment_idx, seq)
        seq += 1
        nodes.append(
            {
                "id": n.id,
                "label": n.label,
                "name": n.name,
                "full_name": subst(n.full_name),
                "signature": n.signature,
                "code": n.code,
                "order": n.order,
                "argument_index": n.argument_index,
                "dispatch_type": n.dispatch_type,
                "method_full_name": subst(n.method_full_name),
                "type_full_name": subst(n.type_full_name),
                "dynamic_type_hint_full_name": (
                    sorted(subst(h) for h in n.dynamic_type_hints)
                    if n.dynamic_type_hints
                    else None
                ),
                "line": n.line,
                "col": n.col,
                "url": url,
                "fragment_idx": fragment_idx,
                "lang": lang,
            }
        )
        for i, c in enumerate(n.children, start=1):
            c.order = i
            assign(c)
            edges.append({"subj": n.id, "pred": "AST", "obj": c.id, "variable": None})
        for i, a in enumerate(n.argument_children, start=1):
            if a.argument_index < 0:
                a.argument_index = i
            edges.append(
                {"subj": n.id, "pred": "ARGUMENT", "obj": a.id, "variable": None}
            )
        if n.condition_child is not None:
            edges.append(
                {
                    "subj": n.id,
                    "pred": "CONDITION",
                    "obj": n.condition_child.id,
                    "variable": None,
                }
            )
        if n.receiver_child is not None:
            edges.append(
                {
                    "subj": n.id,
                    "pred": "RECEIVER",
                    "obj": n.receiver_child.id,
                    "variable": None,
                }
            )

    # argument_index must be set before assignment recursion reaches the
    # child (it is written into the node row), so pre-walk the tree.
    def pre_set_argidx(n: PNode) -> None:
        for i, a in enumerate(n.argument_children, start=1):
            if a.argument_index < 0:
                a.argument_index = i
        for c in n.children:
            pre_set_argidx(c)

    pre_set_argidx(root)
    assign(root)

    # REF edges (identifier -> local/param) resolved after ids exist.
    def emit_refs(n: PNode) -> None:
        if n.ref_target is not None and n.ref_target.id:
            edges.append(
                {"subj": n.id, "pred": "REF", "obj": n.ref_target.id, "variable": None}
            )
        for pred, tgt in n.extra_edges:
            if tgt.id:
                edges.append(
                    {"subj": n.id, "pred": pred, "obj": tgt.id, "variable": None}
                )
        for c in n.children:
            emit_refs(c)

    emit_refs(root)
    return nodes, edges
