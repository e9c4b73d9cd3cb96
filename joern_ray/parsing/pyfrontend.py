"""Python fragment frontend: stdlib `ast` -> Joern-style PNode tree.

The analog of the reference's pysrc2cpg frontend
(`joern-cli/frontends/pysrc2cpg`, e.g. `PythonAstVisitor.scala` module
method + function/class lowering): Python is the #1 web-corpus language,
and the container ships a robust deterministic parser in the standard
library, so this frontend maps `ast` trees onto the same PNode IR the
C/Java/JS recursive-descent parser produces — downstream flattening,
CFG/dominator/DDG overlays and linking are shared unchanged.

Conventions (mirroring pysrc2cpg):
- module statements live in a synthetic `<module>` METHOD (pysrc2cpg's
  module method), functions/classes attach to the NAMESPACE_BLOCK so
  they link by name;
- top-level `def f` -> METHOD full_name "f" (cross-document linking by
  name, same as the C frontend), `class C: def m` -> "C.m", nested defs
  -> dotted path;
- `self.m()` inside `class C` -> method_full_name "C.m" with
  DYNAMIC_DISPATCH (SAFEDISPATCH candidates resolve overrides);
- expressions lower to `<operator>.*` synthetic calls (assignment,
  binary ops, fieldAccess, indexAccess — Joern Operators vocabulary).

Tolerance: `ast.parse` failures retry after dedent, then raise
ParseError -> reject row upstream (per-file skip semantics,
`c2cpg/.../AstCreationPass.scala:200-215`).
"""

from __future__ import annotations

import ast as pyast

from .astmodel import DYNAMIC_DISPATCH, FRAG_PLACEHOLDER, STATIC_DISPATCH, PNode
from .parser import ParseError  # shared: upstream reject handling catches it

MAX_NODES_PER_FRAGMENT = 50_000
MAX_CODE_LEN = 300


_BINOP = {
    pyast.Add: "<operator>.addition",
    pyast.Sub: "<operator>.subtraction",
    pyast.Mult: "<operator>.multiplication",
    pyast.Div: "<operator>.division",
    pyast.FloorDiv: "<operator>.division",
    pyast.Mod: "<operator>.modulo",
    pyast.Pow: "<operator>.exponentiation",
    pyast.BitAnd: "<operator>.and",
    pyast.BitOr: "<operator>.or",
    pyast.BitXor: "<operator>.xor",
    pyast.LShift: "<operator>.shiftLeft",
    pyast.RShift: "<operator>.arithmeticShiftRight",
    pyast.MatMult: "<operator>.multiplication",
}
_CMPOP = {
    pyast.Eq: "<operator>.equals",
    pyast.NotEq: "<operator>.notEquals",
    pyast.Lt: "<operator>.lessThan",
    pyast.LtE: "<operator>.lessEqualsThan",
    pyast.Gt: "<operator>.greaterThan",
    pyast.GtE: "<operator>.greaterEqualsThan",
    pyast.Is: "<operator>.equals",
    pyast.IsNot: "<operator>.notEquals",
    pyast.In: "<operator>.in",
    pyast.NotIn: "<operator>.notIn",
}
_UNARYOP = {
    pyast.USub: "<operator>.minus",
    pyast.UAdd: "<operator>.plus",
    pyast.Not: "<operator>.logicalNot",
    pyast.Invert: "<operator>.not",
}
_AUG = {
    pyast.Add: "<operator>.assignmentPlus",
    pyast.Sub: "<operator>.assignmentMinus",
    pyast.Mult: "<operator>.assignmentMultiplication",
    pyast.Div: "<operator>.assignmentDivision",
    pyast.Mod: "<operator>.assignmentModulo",
}


class PyFragmentParser:
    """stdlib-ast-backed frontend with the same `parse(src, url, idx)`
    surface as FragmentParser; one instance per actor, reused across
    fragments."""

    dialect = "python"

    def parse(self, src: str, url: str, fragment_idx: int) -> PNode:
        try:
            tree = pyast.parse(src)
        except (SyntaxError, ValueError, MemoryError, RecursionError):
            import textwrap

            try:
                tree = pyast.parse(textwrap.dedent(src))
            except (SyntaxError, ValueError, MemoryError, RecursionError) as e:
                raise ParseError(f"python parse failed: {e}") from e
        self._lines = src.splitlines(keepends=True)
        self._offs = [0]
        for ln in self._lines:
            self._offs.append(self._offs[-1] + len(ln))
        self._src = src
        self.node_count = 0
        self.scopes: list[dict[str, PNode]] = [{}]
        self.class_stack: list[str] = []
        self.fn_stack: list[str] = []
        self.lambda_counter = 0
        self.pending_locals: list[PNode] = []
        # var name -> class name for `x = C()` receiver-type tracking
        self.instance_types: list[dict[str, str]] = [{}]
        # var name -> SET of hinted type fqns for receivers whose class is
        # NOT defined in this fragment (imported / cross-document).  The
        # flow-insensitive accumulate-a-set semantics of the reference
        # SymbolTable (`SymbolTable.scala:69-155`, appended by
        # `XTypeRecovery.scala:352-357`); the in-order statement walk is
        # iteration 1, copy-assignments extend chains in document order.
        self.hint_types: list[dict[str, set]] = [{}]
        self.known_defs: set[str] = set()
        self._collect_defs(tree)
        root = PNode(
            "NAMESPACE_BLOCK",
            name="<global>",
            full_name=f"{FRAG_PLACEHOLDER}:<global>",
            code="<global>",
            line=1,
            col=1,
        )
        mod = self._new_at(tree, "METHOD", name="<module>",
                           full_name=f"<module>@{FRAG_PLACEHOLDER}",
                           signature="", code="<module>")
        body = PNode("BLOCK", code="<module>", line=1, col=1)
        self.node_count += 1
        for stmt in tree.body:
            for n in self._stmt(stmt):
                if n.label in ("METHOD", "TYPE_DECL", "IMPORT"):
                    root.add(n)
                    if n.label == "IMPORT":
                        root.extra_edges.append(("IMPORTS", n))
                else:
                    self._drain_locals(body)
                    body.add(n)
        self._drain_locals(body)
        self._finish_method(mod, body, "ANY")
        root.add(mod)
        return root

    # ---- helpers ----------------------------------------------------------

    def _collect_defs(self, tree) -> None:
        """Pre-pass: names of module-level defs/classes (call resolution
        may precede the definition textually)."""
        for s in tree.body:
            if isinstance(s, (pyast.FunctionDef, pyast.AsyncFunctionDef)):
                self.known_defs.add(s.name)
            elif isinstance(s, pyast.ClassDef):
                self.known_defs.add(s.name)

    def _code(self, node) -> str:
        try:
            a = self._offs[node.lineno - 1] + node.col_offset
            b = self._offs[node.end_lineno - 1] + node.end_col_offset
            s = self._src[a:b]
        except (AttributeError, IndexError):
            s = ""
        return s if len(s) <= MAX_CODE_LEN else s[:MAX_CODE_LEN]

    def _new_at(self, anode, label: str, **kw) -> PNode:
        self.node_count += 1
        if self.node_count > MAX_NODES_PER_FRAGMENT:
            raise ParseError("fragment exceeds node budget")
        kw.setdefault("line", getattr(anode, "lineno", 1) or 1)
        kw.setdefault("col", (getattr(anode, "col_offset", 0) or 0) + 1)
        return PNode(label, **kw)

    def _lookup(self, name: str) -> PNode | None:
        for sc in reversed(self.scopes):
            if name in sc:
                return sc[name]
        return None

    def _ann_type(self, ann) -> str:
        if ann is None:
            return ""
        if isinstance(ann, pyast.Name):
            return ann.id
        if isinstance(ann, pyast.Constant) and isinstance(ann.value, str):
            return ann.value
        if isinstance(ann, pyast.Attribute):
            return ann.attr
        if isinstance(ann, pyast.Subscript):
            return self._ann_type(ann.value)
        return ""

    def _finish_method(self, m: PNode, body: PNode, ret_type: str) -> None:
        m.add(body)
        ret = PNode("METHOD_RETURN", code="RET", type_full_name=ret_type,
                    line=m.line, col=m.col)
        self.node_count += 1
        m.add(ret)
        for p in [c for c in m.children if c.label == "METHOD_PARAMETER_IN"]:
            out = PNode("METHOD_PARAMETER_OUT", name=p.name, code=p.code,
                        type_full_name=p.type_full_name, line=p.line, col=p.col)
            self.node_count += 1
            m.add(out)
            p.extra_edges.append(("PARAMETER_LINK", out))

    # ---- statements -------------------------------------------------------

    def _stmt(self, s) -> list[PNode]:
        try:
            return self._stmt_inner(s)
        except ParseError:
            raise
        except Exception:
            n = self._new_at(s, "UNKNOWN", code=self._code(s))
            return [n]

    def _stmt_inner(self, s) -> list[PNode]:
        if isinstance(s, (pyast.FunctionDef, pyast.AsyncFunctionDef)):
            return [self._function(s)]
        if isinstance(s, pyast.ClassDef):
            return [self._classdef(s)]
        if isinstance(s, (pyast.Import, pyast.ImportFrom)):
            out = []
            mod = getattr(s, "module", None)
            for alias in s.names:
                imp = f"{mod}.{alias.name}" if mod else alias.name
                out.append(self._new_at(s, "IMPORT", name=imp,
                                        code=f"import {imp}"))
            return out
        if isinstance(s, pyast.Return):
            r = self._new_at(s, "RETURN", code=self._code(s))
            if s.value is not None:
                v = self._expr(s.value)
                r.add(v)
                r.argument_children.append(v)
            return [r]
        if isinstance(s, pyast.Assign):
            out = []
            for tgt in s.targets:
                out.append(self._assign(s, tgt, s.value, "<operator>.assignment"))
            return out
        if isinstance(s, pyast.AugAssign):
            op = _AUG.get(type(s.op), "<operator>.assignment")
            return [self._assign(s, s.target, s.value, op)]
        if isinstance(s, pyast.AnnAssign):
            if s.value is None:
                # bare annotation: a LOCAL declaration
                if isinstance(s.target, pyast.Name):
                    loc = self._new_at(s, "LOCAL", name=s.target.id,
                                       code=self._code(s),
                                       type_full_name=self._ann_type(s.annotation))
                    self.scopes[-1][s.target.id] = loc
                    return [loc]
                return []
            n = self._assign(s, s.target, s.value, "<operator>.assignment")
            if isinstance(s.target, pyast.Name):
                tgt_node = self._lookup(s.target.id)
                if tgt_node is not None and not tgt_node.type_full_name:
                    tgt_node.type_full_name = self._ann_type(s.annotation)
            return [n]
        if isinstance(s, pyast.If):
            n = self._new_at(s, "CONTROL_STRUCTURE", name="IF",
                             code=self._code(s))
            cond = self._expr(s.test)
            n.condition_child = cond
            n.add(cond)
            n.add(self._block(s, s.body))
            if s.orelse:
                n.add(self._block(s, s.orelse))
            return [n]
        if isinstance(s, (pyast.While,)):
            n = self._new_at(s, "CONTROL_STRUCTURE", name="WHILE",
                             code=self._code(s))
            cond = self._expr(s.test)
            n.condition_child = cond
            n.add(cond, self._block(s, s.body))
            return list(self._with_orelse([n], s))
        if isinstance(s, (pyast.For, pyast.AsyncFor)):
            # `for x in it` -> WHILE shape whose condition is the
            # per-iteration binding `x = it` (defines x for the DDG)
            n = self._new_at(s, "CONTROL_STRUCTURE", name="WHILE",
                             code=self._code(s))
            cond = self._assign(s, s.target, s.iter, "<operator>.assignment")
            n.condition_child = cond
            n.add(cond, self._block(s, s.body))
            return list(self._with_orelse([n], s))
        if isinstance(s, pyast.Try):
            n = self._new_at(s, "CONTROL_STRUCTURE", name="TRY",
                             code="try")
            n.add(self._block(s, s.body))
            for h in s.handlers:
                c = self._new_at(h, "CONTROL_STRUCTURE", name="CATCH",
                                 code="except")
                c.add(self._block(h, h.body))
                n.add(c)
            if s.finalbody:
                f = self._new_at(s, "CONTROL_STRUCTURE", name="FINALLY",
                                 code="finally")
                f.add(self._block(s, s.finalbody))
                n.add(f)
            return [n]
        if isinstance(s, pyast.Raise):
            n = self._new_at(s, "CONTROL_STRUCTURE", name="THROW",
                             code=self._code(s))
            if s.exc is not None:
                n.add(self._expr(s.exc))
            return [n]
        if isinstance(s, pyast.Break):
            return [self._new_at(s, "CONTROL_STRUCTURE", name="BREAK", code="break")]
        if isinstance(s, pyast.Continue):
            return [self._new_at(s, "CONTROL_STRUCTURE", name="CONTINUE", code="continue")]
        if isinstance(s, (pyast.With, pyast.AsyncWith)):
            out: list[PNode] = []
            for item in s.items:
                if item.optional_vars is not None:
                    out.append(self._assign(s, item.optional_vars,
                                            item.context_expr,
                                            "<operator>.assignment"))
                else:
                    out.append(self._expr(item.context_expr))
            blk = self._block(s, s.body)
            out.append(blk)
            return out
        if isinstance(s, pyast.Expr):
            return [self._expr(s.value)]
        if isinstance(s, (pyast.Pass,)):
            return []
        if isinstance(s, pyast.Global) or isinstance(s, pyast.Nonlocal):
            return []
        if isinstance(s, pyast.Assert):
            n = self._new_at(s, "CONTROL_STRUCTURE", name="IF", code=self._code(s))
            cond = self._expr(s.test)
            n.condition_child = cond
            n.add(cond)
            return [n]
        if isinstance(s, pyast.Delete):
            return [self._expr(t) for t in s.targets]
        return [self._new_at(s, "UNKNOWN", code=self._code(s))]

    def _with_orelse(self, nodes: list[PNode], s) -> list[PNode]:
        if getattr(s, "orelse", None):
            for st in s.orelse:
                nodes.extend(self._stmt(st))
        return nodes

    def _drain_locals(self, container: PNode) -> None:
        """Assignment-created LOCALs surface as (non-executed) block
        children, like the C frontend's declarations."""
        for loc in self.pending_locals:
            container.add(loc)
        self.pending_locals.clear()

    def _block(self, anode, stmts) -> PNode:
        # python scoping is function-flat: blocks share the enclosing
        # function scope (no scope push here)
        b = self._new_at(anode, "BLOCK", code="<block>")
        for st in stmts:
            for n in self._stmt(st):
                self._drain_locals(b)
                b.add(n)
        self._drain_locals(b)
        return b

    # ---- defs -------------------------------------------------------------

    def _qualname(self, name: str) -> str:
        parts = self.class_stack + self.fn_stack
        return ".".join(parts + [name]) if parts else name

    def _function(self, s) -> PNode:
        fqn = self._qualname(s.name)
        ret_type = self._ann_type(s.returns) or "ANY"
        args = s.args
        all_args = list(getattr(args, "posonlyargs", [])) + list(args.args)
        ptypes = [self._ann_type(a.annotation) or "ANY" for a in all_args]
        sig = f"{ret_type}({','.join(ptypes)})"
        m = self._new_at(s, "METHOD", name=s.name, full_name=fqn,
                         signature=sig, code=f"def {s.name}")
        self.scopes.append({})
        self.instance_types.append({})
        self.hint_types.append({})
        for a, ptyp in zip(all_args, ptypes):
            p = self._new_at(a, "METHOD_PARAMETER_IN", name=a.arg,
                             code=a.arg,
                             type_full_name="" if ptyp == "ANY" else ptyp)
            m.add(p)
            self.scopes[-1][a.arg] = p
        for extra in ([args.vararg] if args.vararg else []) + list(args.kwonlyargs) + ([args.kwarg] if args.kwarg else []):
            p = self._new_at(extra, "METHOD_PARAMETER_IN", name=extra.arg,
                             code=extra.arg)
            m.add(p)
            self.scopes[-1][extra.arg] = p
        self.fn_stack.append(s.name)
        body = self._new_at(s, "BLOCK", code="<body>")
        for st in s.body:
            for n in self._stmt(st):
                self._drain_locals(body)
                body.add(n)
        self._drain_locals(body)
        self.fn_stack.pop()
        self.instance_types.pop()
        self.hint_types.pop()
        self._finish_method(m, body, ret_type)
        self.scopes.pop()
        return m

    def _classdef(self, s) -> PNode:
        bases = [self._ann_type(b) for b in s.bases if self._ann_type(b)]
        td = self._new_at(s, "TYPE_DECL", name=s.name, full_name=s.name,
                          code=f"class {s.name}",
                          type_full_name=";".join(bases))
        self.class_stack.append(s.name)
        for st in s.body:
            if isinstance(st, (pyast.FunctionDef, pyast.AsyncFunctionDef)):
                m = self._function(st)
                td.add(m)
                td.extra_edges.append(("BINDS", m))
            elif isinstance(st, pyast.Assign) and st.targets and isinstance(st.targets[0], pyast.Name):
                mem = self._new_at(st, "MEMBER", name=st.targets[0].id,
                                   code=self._code(st))
                td.add(mem)
            elif isinstance(st, pyast.AnnAssign) and isinstance(st.target, pyast.Name):
                mem = self._new_at(st, "MEMBER", name=st.target.id,
                                   code=self._code(st),
                                   type_full_name=self._ann_type(st.annotation))
                td.add(mem)
        self.class_stack.pop()
        return td

    # ---- expressions ------------------------------------------------------

    def _assign(self, s, target, value, op: str) -> PNode:
        call = self._new_at(s, "CALL", name=op, method_full_name=op,
                            code=self._code(s), dispatch_type=STATIC_DISPATCH)
        t = self._expr(target, store=True)
        v = self._expr(value)
        call.add(t, v)
        call.argument_children.extend([t, v])
        # `x = C()` -> remember x's class for receiver-typed dispatch
        if (
            isinstance(target, pyast.Name)
            and isinstance(value, pyast.Call)
            and isinstance(value.func, pyast.Name)
            and value.func.id in self.known_defs
            and value.func.id[:1].isupper()
        ):
            self.instance_types[-1][target.id] = value.func.id
        elif isinstance(target, pyast.Name) and isinstance(value, pyast.Call):
            # constructor of a class NOT defined in this fragment
            # (imported / another document): record a TYPE HINT instead —
            # the symbol-table half of XTypeRecovery
            # (`XTypeRecovery.scala:198-209` recovers imported call
            # signatures; hints feed XTypeHintCallLinker downstream)
            ctor = None
            if isinstance(value.func, pyast.Name) and value.func.id[:1].isupper():
                ctor = value.func.id
            elif isinstance(value.func, pyast.Attribute) and value.func.attr[:1].isupper():
                ctor = self._dotted_name(value.func)
            if ctor:
                self.hint_types[-1].setdefault(target.id, set()).add(ctor)
            elif (
                isinstance(value.func, pyast.Name)
                and value.func.id[:1].islower()
                and value.func.id not in self.known_defs
            ):
                # `x = f()` where f is defined in ANOTHER document: x's
                # type is f's RETURN type, which only the link stage
                # knows (f's signature lives in the method index).  The
                # symbolic `<ret:f>` hint is iteration 2 of the
                # reference SymbolTable (`XTypeRecovery.scala:25,
                # 151-177` runs exactly 2 iterations so recovered
                # return types feed back): the control plane resolves
                # `<ret:f>.g` via f's signature into `T.g` candidates.
                self.hint_types[-1].setdefault(target.id, set()).add(
                    f"<ret:{value.func.id}>"
                )
        elif isinstance(target, pyast.Name) and isinstance(value, pyast.Name):
            # `x = y` copies y's accumulated hint set (chain propagation)
            for frame in reversed(self.hint_types):
                if value.id in frame:
                    self.hint_types[-1].setdefault(target.id, set()).update(
                        frame[value.id]
                    )
                    break
        return call

    @staticmethod
    def _dotted_name(node) -> "str | None":
        parts = []
        while isinstance(node, pyast.Attribute):
            parts.append(node.attr)
            node = node.value
        if isinstance(node, pyast.Name):
            parts.append(node.id)
            return ".".join(reversed(parts))
        return None

    def _expr(self, e, store: bool = False) -> PNode:
        try:
            return self._expr_inner(e, store)
        except ParseError:
            raise
        except Exception:
            return self._new_at(e, "UNKNOWN", code=self._code(e))

    def _expr_inner(self, e, store: bool = False) -> PNode:
        if isinstance(e, pyast.Name):
            n = self._new_at(e, "IDENTIFIER", name=e.id, code=e.id)
            tgt = self._lookup(e.id)
            if tgt is None and store:
                loc = self._new_at(e, "LOCAL", name=e.id, code=e.id)
                self.scopes[-1][e.id] = loc
                self.pending_locals.append(loc)
                tgt = loc
            if tgt is not None:
                n.ref_target = tgt
            return n
        if isinstance(e, pyast.Constant):
            v = e.value
            tfn = (
                "int" if isinstance(v, bool) is False and isinstance(v, int)
                else "bool" if isinstance(v, bool)
                else "float" if isinstance(v, float)
                else "str" if isinstance(v, str)
                else ""
            )
            return self._new_at(e, "LITERAL", code=self._code(e) or repr(v),
                                type_full_name=tfn)
        if isinstance(e, pyast.Call):
            return self._call(e)
        if isinstance(e, pyast.BinOp):
            op = _BINOP.get(type(e.op), "<operator>.addition")
            c = self._new_at(e, "CALL", name=op, method_full_name=op,
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            a, b = self._expr(e.left), self._expr(e.right)
            c.add(a, b)
            c.argument_children.extend([a, b])
            return c
        if isinstance(e, pyast.BoolOp):
            op = ("<operator>.logicalAnd" if isinstance(e.op, pyast.And)
                  else "<operator>.logicalOr")
            vals = [self._expr(v) for v in e.values]
            cur = vals[0]
            for nxt in vals[1:]:
                c = self._new_at(e, "CALL", name=op, method_full_name=op,
                                 code=self._code(e), dispatch_type=STATIC_DISPATCH)
                c.add(cur, nxt)
                c.argument_children.extend([cur, nxt])
                cur = c
            return cur
        if isinstance(e, pyast.Compare):
            left = self._expr(e.left)
            cur = None
            for op, comp in zip(e.ops, e.comparators):
                opname = _CMPOP.get(type(op), "<operator>.equals")
                rhs = self._expr(comp)
                c = self._new_at(e, "CALL", name=opname, method_full_name=opname,
                                 code=self._code(e), dispatch_type=STATIC_DISPATCH)
                c.add(left, rhs)
                c.argument_children.extend([left, rhs])
                left = rhs  # chained comparison: each op compares against the previous comparator
                if cur is None:
                    cur = c
                else:
                    andc = self._new_at(e, "CALL", name="<operator>.logicalAnd",
                                        method_full_name="<operator>.logicalAnd",
                                        code=self._code(e),
                                        dispatch_type=STATIC_DISPATCH)
                    andc.add(cur, c)
                    andc.argument_children.extend([cur, c])
                    cur = andc
            return cur if cur is not None else left
        if isinstance(e, pyast.UnaryOp):
            op = _UNARYOP.get(type(e.op), "<operator>.minus")
            c = self._new_at(e, "CALL", name=op, method_full_name=op,
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            a = self._expr(e.operand)
            c.add(a)
            c.argument_children.append(a)
            return c
        if isinstance(e, pyast.Attribute):
            c = self._new_at(e, "CALL", name="<operator>.fieldAccess",
                             method_full_name="<operator>.fieldAccess",
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            base = self._expr(e.value)
            fld = self._new_at(e, "FIELD_IDENTIFIER", name=e.attr, code=e.attr)
            c.add(base, fld)
            c.argument_children.extend([base, fld])
            return c
        if isinstance(e, pyast.Subscript):
            c = self._new_at(e, "CALL", name="<operator>.indexAccess",
                             method_full_name="<operator>.indexAccess",
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            base = self._expr(e.value)
            idx = self._expr(e.slice)
            c.add(base, idx)
            c.argument_children.extend([base, idx])
            return c
        if isinstance(e, pyast.IfExp):
            c = self._new_at(e, "CALL", name="<operator>.conditional",
                             method_full_name="<operator>.conditional",
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            t, b, o = self._expr(e.test), self._expr(e.body), self._expr(e.orelse)
            c.add(t, b, o)
            c.argument_children.extend([t, b, o])
            return c
        if isinstance(e, pyast.Lambda):
            self.lambda_counter += 1
            k = self.lambda_counter
            fqn = f"<lambda>{k}@{FRAG_PLACEHOLDER}"
            m = self._new_at(e, "METHOD", name="<lambda>", full_name=fqn,
                             signature="", code=self._code(e))
            self.scopes.append({})
            for a in e.args.args:
                p = self._new_at(a, "METHOD_PARAMETER_IN", name=a.arg, code=a.arg)
                m.add(p)
                self.scopes[-1][a.arg] = p
            body = self._new_at(e, "BLOCK", code="<body>")
            r = self._new_at(e, "RETURN", code=self._code(e))
            v = self._expr(e.body)
            r.add(v)
            r.argument_children.append(v)
            body.add(r)
            self._finish_method(m, body, "ANY")
            self.scopes.pop()
            ref = self._new_at(e, "METHOD_REF", name="<lambda>",
                               method_full_name=fqn, code=self._code(e))
            ref.add(m)
            return ref
        if isinstance(e, (pyast.List, pyast.Tuple, pyast.Set)):
            c = self._new_at(e, "CALL", name="<operator>.arrayInitializer",
                             method_full_name="<operator>.arrayInitializer",
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            for el in e.elts:
                v = self._expr(el, store=store)
                c.add(v)
                c.argument_children.append(v)
            return c
        if isinstance(e, pyast.Dict):
            c = self._new_at(e, "CALL", name="<operator>.arrayInitializer",
                             method_full_name="<operator>.arrayInitializer",
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            for k_, v_ in zip(e.keys, e.values):
                if k_ is not None:
                    c.add(self._expr(k_))
                c.add(self._expr(v_))
            return c
        if isinstance(e, pyast.JoinedStr):
            c = self._new_at(e, "CALL", name="<operator>.formatString",
                             method_full_name="<operator>.formatString",
                             code=self._code(e), dispatch_type=STATIC_DISPATCH)
            for v_ in e.values:
                if isinstance(v_, pyast.FormattedValue):
                    a = self._expr(v_.value)
                    c.add(a)
                    c.argument_children.append(a)
            return c
        if isinstance(e, pyast.Starred):
            return self._expr(e.value, store=store)
        if isinstance(e, (pyast.ListComp, pyast.SetComp, pyast.DictComp, pyast.GeneratorExp)):
            return self._new_at(e, "UNKNOWN", code=self._code(e))
        if isinstance(e, pyast.Await):
            return self._expr(e.value)
        return self._new_at(e, "UNKNOWN", code=self._code(e))

    def _call(self, e: pyast.Call) -> PNode:
        func = e.func
        hint_list: list[str] = []
        if isinstance(func, pyast.Name):
            name = func.id
            mfn = name
            disp = STATIC_DISPATCH
            recv = None
        elif isinstance(func, pyast.Attribute):
            name = func.attr
            disp = DYNAMIC_DISPATCH
            recv = self._expr(func.value)
            base = func.value
            if isinstance(base, pyast.Name):
                if base.id == "self" and self.class_stack:
                    mfn = f"{self.class_stack[-1]}.{name}"
                else:
                    cls = None
                    for frame in reversed(self.instance_types):
                        if base.id in frame:
                            cls = frame[base.id]
                            break
                    if cls is None:
                        # recovered-hint receiver types: exactly ONE hint
                        # resolves the call here (reference setCallees,
                        # `XTypeHintCallLinker.scala:93-105`); ambiguous
                        # sets ride the dynamic_type_hint_full_name list
                        # into the link-stage XTypeHintCallLinker
                        hints = None
                        for frame in reversed(self.hint_types):
                            if base.id in frame:
                                hints = frame[base.id]
                                break
                        if hints and len(hints) == 1:
                            t = next(iter(hints))
                            # a symbolic `<ret:f>` hint routes the call
                            # fqn to the control plane's iteration-2
                            # resolution but must NOT type the receiver:
                            # an unresolvable sentinel would otherwise
                            # materialize as a phantom TYPE node /
                            # EVAL_TYPE target (the reference never
                            # emits such names)
                            if not t.startswith("<ret:"):
                                recv.type_full_name = recv.type_full_name or t
                            mfn = f"{t}.{name}"
                        elif hints:
                            # multi-hint: `<ret:` sentinels are excluded
                            # from the XTypeHintCallLinker probe list —
                            # the hint linker cannot resolve them and
                            # they would leak as speculative stub names
                            real = sorted(t for t in hints if not t.startswith("<ret:"))
                            if len(real) == 1:
                                recv.type_full_name = recv.type_full_name or real[0]
                                mfn = f"{real[0]}.{name}"
                            else:
                                if len(real) > 1:
                                    hint_list = [f"{t}.{name}" for t in real]
                                mfn = f"{base.id}.{name}"
                        else:
                            mfn = f"{base.id}.{name}"
                    else:
                        mfn = f"{cls}.{name}"
            else:
                mfn = name
        else:
            name = "<call>"
            mfn = ""
            disp = DYNAMIC_DISPATCH
            recv = self._expr(func)
        c = self._new_at(e, "CALL", name=name, method_full_name=mfn,
                         code=self._code(e), dispatch_type=disp)
        if hint_list:
            c.dynamic_type_hints = hint_list
        if recv is not None:
            recv.argument_index = 0
            c.receiver_child = recv
            c.add(recv)
        for a in e.args:
            v = self._expr(a)
            c.add(v)
            c.argument_children.append(v)
        for kw in e.keywords:
            v = self._expr(kw.value)
            c.add(v)
            c.argument_children.append(v)
        return c
