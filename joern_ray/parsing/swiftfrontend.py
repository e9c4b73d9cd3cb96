"""Swift fragment frontend — swiftsrc2cpg analog on the shared machinery.

The reference ships a Swift frontend (`joern-cli/frontends/swiftsrc2cpg`,
`AstCreator` over the SwiftSyntax JSON dump); this re-expresses its
output shape on the shared PNode IR.  Swift is brace-shaped with
`func`/`let`/`var` declarations, so the frontend rides the JS dialect of
`FragmentParser` (statement/expression machinery) and adds the
Swift-specific layer:

- `import Foundation` -> IMPORT
- `func name(label x: T) -> R { }` -> METHOD with typed params and
  signature; argument labels (`with x: Int`, `_ x: Int`) bind the
  INTERNAL name, matching swiftsrc2cpg's parameter lowering
- `class C: Base, Proto` / `struct` / `protocol` / `enum` / `actor`
  -> TYPE_DECL with the ;-joined inherits list; stored `let`/`var`
  properties (incl. computed ones) -> MEMBERs carrying the
  FieldAccessLinkerPass join handle; enum `case a, b` -> MEMBERs
- `init(...)` -> METHOD named init with full_name `C.init`, so the
  parenthesis-less constructor call `C(...)` links (SAFEDISPATCH and
  the ctor pathway the Kotlin frontend established)
- `extension C { func m() }` -> methods attach to the TYPE_DECL for C
  declared in THIS fragment when present; a CROSS-fragment extension
  emits a duplicate TYPE_DECL that FullNameUniquenessPass canonicalizes
  and the cross-fragment AstLinkerPass re-links — one AST tree per
  type either way (same pathway as Rust impl blocks / reopened Ruby
  classes)
- `let x = C()` types the local from the ctor call so `x.m()`
  dispatches as C.m; `self.f` rides the shared `this` member machinery
- paren-less `if`/`while`/`guard let ... else` -> IF/WHILE lowerings;
  `for x in xs` -> WHILE with the per-iteration binding as condition;
  `switch v { case p: ... }` -> SWITCH with IF branch children
- labeled call arguments `f(x: 1)` are unwrapped to positional args
  (the label is dropped, the expression kept — swiftsrc2cpg keeps the
  label on the ARGUMENT edge; our ARGUMENT ordinal is positional)
"""

from __future__ import annotations

from .astmodel import FRAG_PLACEHOLDER, PNode, STATIC_DISPATCH
from .parser import FragmentParser, ParseError

_SW_MODIFIERS = frozenset(
    "public private fileprivate internal open final static override "
    "mutating nonmutating lazy weak unowned required convenience "
    "indirect dynamic optional nonisolated distributed".split()
)

_SW_TYPE_KW = ("class", "struct", "protocol", "enum", "extension", "actor")


class SwiftFragmentParser(FragmentParser):
    """`parse(src, url, idx)` surface identical to the other frontends;
    one instance per actor, reused across fragments."""

    def __init__(self) -> None:
        super().__init__("javascript")
        self.dialect = "swift"

    # ---- entry -----------------------------------------------------------

    def parse(self, src: str, url: str, fragment_idx: int) -> PNode:
        from .tokenizer import tokenize

        self.src = src
        self.toks = tokenize(src)
        # Swift's receiver keyword is `self`; the shared member machinery
        # keys on the token text `this` (code slices keep the original
        # source text — only the token stream is normalized, the same
        # trick the Rust frontend uses for `::` -> `.`)
        for t in self.toks:
            if t.text == "self":
                t.text = "this"
        self.i = 0
        self.url = url
        self.fragment_idx = fragment_idx
        self.scopes = [{}]
        self.class_members_stack = []
        self.class_name_stack = []
        self.node_count = 0
        self.lambda_counter = 0
        self.lambda_stack = []
        # fragment-local TYPE_DECL registry: `extension C` attaches to a
        # C declared in THIS fragment instead of emitting a duplicate
        # decl; cross-fragment extensions still emit the duplicate that
        # canonicalization + AstLinkerPass unify.
        self._local_tds: dict[str, PNode] = {}
        root = PNode(
            "NAMESPACE_BLOCK",
            name="<global>",
            full_name=f"{FRAG_PLACEHOLDER}:<global>",
            code="<global>",
            line=1,
            col=1,
        )
        self.node_count += 1
        if not self.toks or self._at_eof():
            raise ParseError("empty swift fragment")
        prog = self._make_method_shell(
            ":program", f":program@{FRAG_PLACEHOLDER}", "", [], "ANY", self.toks[0]
        )
        body = PNode("BLOCK", code="<program>", line=1, col=1)
        self.node_count += 1
        self.scopes.append({})
        self.lambda_stack.append([])
        n_meaningful = 0
        while not self._at_eof():
            before = self.i
            for n in self._parse_stmt_safe():
                if n.label in ("METHOD", "TYPE_DECL"):
                    root.add(n)
                elif n.label == "IMPORT":
                    root.add(n)
                    root.extra_edges.append(("IMPORTS", n))
                else:
                    body.add(n)
                n_meaningful += 1
            if self.i == before:
                self.i += 1
        if n_meaningful == 0:
            raise ParseError("no swift statements found")
        self._finish_method(prog, body, "ANY")
        self.lambda_stack.pop()
        self.scopes.pop()
        root.add(prog)
        return root

    # ---- statements ------------------------------------------------------

    def _parse_stmt(self) -> list[PNode]:
        t = self._tok()
        txt = t.text
        while txt == "@":
            # attribute: @objc, @available(...), @MainActor
            self.i += 1
            if self._tok().kind == "id":
                self.i += 1
            if self._at("("):
                self._skip_balanced("(", ")")
            t = self._tok()
            txt = t.text
        while t.kind == "id" and txt in _SW_MODIFIERS and self._tok(1).kind == "id":
            self.i += 1
            t = self._tok()
            txt = t.text
        if txt == "import" and self._tok(1).kind == "id":
            return self._sw_import()
        if txt == "func" and self._tok(1).kind == "id":
            return [self._sw_func()]
        if txt in _SW_TYPE_KW and self._tok(1).kind == "id":
            return self._sw_class(txt)
        if txt in ("let", "var"):
            return self._sw_decl()
        if txt == "guard":
            return [self._sw_guard()]
        if txt == "for":
            return [self._sw_for()]
        if txt == "switch":
            return [self._sw_switch()]
        out = super()._parse_stmt()
        for n in out:
            self._sw_type_assign(n)
        return out

    def _sw_import(self) -> list[PNode]:
        t = self._expect("import")
        parts = []
        while self._tok().kind == "id":
            parts.append(self._tok().text)
            self.i += 1
            if not self._accept("."):
                break
        imp = ".".join(parts)
        if not imp:
            return []
        return [self._new("IMPORT", t, name=imp, code=f"import {imp}")]

    # ---- types / params ----------------------------------------------------

    def _sw_type(self) -> str:
        """Consume a type after `:` or `->`: `[T]`/`[K: V]` collection
        sugar, dotted names, generic args, `?`/`!` optionals.  Returns
        the base type text ('' when unparseable)."""
        if self._at("["):
            self._skip_balanced("[", "]")
            self._accept("?")
            return ""
        if self._tok().kind != "id":
            return ""
        typ = self._tok().text
        self.i += 1
        while self._at(".") and self._tok(1).kind == "id":
            typ += "." + self._tok(1).text
            self.i += 2
        if self._at("<"):
            self._skip_balanced("<", ">")
        while self._at("?") or self._at("!"):
            self.i += 1
        return typ

    def _sw_params(self) -> list[PNode]:
        """`(label name: T = d, _ name: T)` -> METHOD_PARAMETER_IN nodes
        bound to the INTERNAL (second) name."""
        params: list[PNode] = []
        self._expect("(")
        while not self._at_eof() and not self._at(")"):
            pt = self._tok()
            if pt.kind != "id" and pt.text != "_":
                self.i += 1
                continue
            self.i += 1
            # two names before `:` -> external label + internal name
            if self._tok().kind == "id" and self._at(":", 1):
                pt = self._tok()
                self.i += 1
            typ = ""
            if self._accept(":"):
                self._accept("inout")
                while self._tok().text == "@":
                    self.i += 1
                    if self._tok().kind == "id":
                        self.i += 1
                    if self._at("("):
                        self._skip_balanced("(", ")")
                typ = self._sw_type()
            if self._accept("="):
                self._parse_conditional()
            p = self._new(
                "METHOD_PARAMETER_IN", pt, name=pt.text, code=pt.text,
                type_full_name=typ,
            )
            params.append(p)
            self._accept(",")
        self._accept(")")
        return params

    # ---- declarations ------------------------------------------------------

    def _sw_func(self, *, name_override: "str | None" = None) -> PNode:
        t = self._expect("func") if name_override is None else self._tok()
        if name_override is None:
            name_t = self._tok()
            self.i += 1
            fname = name_t.text
        else:
            fname = name_override
            name_t = t
        if self._at("<"):
            self._skip_balanced("<", ">")
        cls = self.class_name_stack[-1] if self.class_name_stack else ""
        fqn = f"{cls}.{fname}" if cls else fname
        self.scopes.append({})
        m = self._new(
            "METHOD", t, name=fname, full_name=fqn, signature="",
            code=f"func {fname}",
        )
        params = self._sw_params() if self._at("(") else []
        for p in params:
            m.add(p)
            self.scopes[-1][p.name] = p
        for eff in ("async", "throws", "rethrows"):
            if self._tok().text == eff:
                self.i += 1
        ret = "ANY"
        if self._accept("->"):
            ret = self._sw_type() or "ANY"
        m.signature = f"{ret}({','.join((p.type_full_name or 'ANY') for p in params)})"
        body = self._parse_block() if self._at("{") else self._new("BLOCK", name_t, code="<body>")
        self._finish_method(m, body, ret)
        self.scopes.pop()
        return m

    def _sw_class(self, kw: str) -> list[PNode]:
        """Returns `[td]` for a fresh declaration, `[]` when an
        `extension C` merged into the TYPE_DECL already emitted by THIS
        fragment (re-adding the same node would double its subtree)."""
        t = self._expect(kw)
        name_t = self._tok()
        self.i += 1
        if self._at("<"):
            self._skip_balanced("<", ">")
        merge = kw == "extension" and name_t.text in self._local_tds
        if merge:
            td = self._local_tds[name_t.text]
        else:
            td = self._new(
                "TYPE_DECL", t, name=name_t.text, full_name=name_t.text,
                code=f"{kw} {name_t.text}", type_full_name="",
            )
            if kw != "extension":
                self._local_tds[name_t.text] = td
        self.class_name_stack.append(name_t.text)
        self.class_members_stack.append(
            {m.name: m for m in td.children if m.label == "MEMBER"} if merge else {}
        )
        parents = [p for p in (td.type_full_name or "").split(";") if p]
        if self._accept(":"):
            while self._tok().kind == "id":
                pname = self._sw_type()
                if pname:
                    parents.append(pname)
                if not self._accept(","):
                    break
        td.type_full_name = ";".join(parents)
        if self._accept("where"):
            while not self._at_eof() and not self._at("{"):
                self.i += 1
        if self._at("{"):
            self._expect("{")
            while not self._at_eof() and not self._at("}"):
                before = self.i
                try:
                    for n in self._sw_member(name_t.text):
                        td.add(n)
                        if n.label == "METHOD":
                            td.extra_edges.append(("BINDS", n))
                        elif n.label == "MEMBER":
                            self.class_members_stack[-1][n.name] = n
                except ParseError:
                    self._sync(before, td)
                if self.i == before:
                    self.i += 1
            self._accept("}")
        self.class_members_stack.pop()
        self.class_name_stack.pop()
        return [] if merge else [td]

    def _sw_member(self, cls: str) -> list[PNode]:
        """One class-body item: method, init/deinit, stored/computed
        property -> MEMBER, enum `case` -> MEMBERs."""
        while self._tok().text == "@":
            self.i += 1
            if self._tok().kind == "id":
                self.i += 1
            if self._at("("):
                self._skip_balanced("(", ")")
        while self._tok().kind == "id" and self._tok().text in _SW_MODIFIERS:
            self.i += 1
        t = self._tok()
        txt = t.text
        if txt == "func" and self._tok(1).kind == "id":
            return [self._sw_func()]
        if txt == "init":
            self.i += 1
            self._accept("?")
            m = self._sw_func(name_override="init")
            m.full_name = f"{cls}.init"
            m.code = f"{cls}(...)"
            return [m]
        if txt == "deinit":
            self.i += 1
            m = self._new(
                "METHOD", t, name="deinit", full_name=f"{cls}.deinit",
                signature="ANY()", code="deinit",
            )
            body = self._parse_block() if self._at("{") else self._new("BLOCK", t, code="<body>")
            self._finish_method(m, body, "ANY")
            return [m]
        if txt in _SW_TYPE_KW and self._tok(1).kind == "id":
            return self._sw_class(txt)
        if txt == "case":  # enum cases
            self.i += 1
            out: list[PNode] = []
            while self._tok().kind == "id":
                ct = self._tok()
                self.i += 1
                if self._at("("):
                    self._skip_balanced("(", ")")
                if self._accept("="):
                    self._parse_conditional()
                mem = self._new(
                    "MEMBER", ct, name=ct.text, code=f"case {ct.text}",
                    type_full_name=cls,
                )
                mem.full_name = f"{cls}.{ct.text}"
                out.append(mem)
                if not self._accept(","):
                    break
            return out
        if txt in ("let", "var"):
            self.i += 1
            name_t = self._tok()
            if name_t.kind != "id":
                return []
            self.i += 1
            typ = ""
            if self._accept(":"):
                typ = self._sw_type()
            mem = self._new(
                "MEMBER", name_t, name=name_t.text,
                code=f"{txt} {name_t.text}", type_full_name=typ,
            )
            mem.full_name = f"{cls}.{name_t.text}"
            if self._accept("="):
                self._parse_assign_expr()
            if self._at("{"):  # computed property / willSet-didSet
                self._skip_balanced("{", "}")
            self._accept(";")
            return [mem]
        raise ParseError(f"unparsed swift member at {txt!r}")

    def _sw_decl(self) -> list[PNode]:
        """Statement `let x[: T] = e` / `var ...` -> LOCAL + assignment;
        `x = C()` (uppercase direct call) types the local."""
        kw = self._tok()
        self.i += 1
        name_t = self._tok()
        if name_t.kind != "id":
            return []
        self.i += 1
        typ = ""
        if self._accept(":"):
            typ = self._sw_type()
        local = self._new(
            "LOCAL", name_t, name=name_t.text, code=name_t.text,
            type_full_name=typ,
        )
        self.scopes[-1][name_t.text] = local
        out: list[PNode] = [local]
        if self._accept("="):
            ident = self._new("IDENTIFIER", name_t, name=name_t.text, code=name_t.text)
            ident.ref_target = local
            rhs = self._parse_assign_expr()
            call = self._new(
                "CALL", kw, name="<operator>.assignment",
                method_full_name="<operator>.assignment",
                dispatch_type=STATIC_DISPATCH,
                code=f"{name_t.text} = {rhs.code}",
            )
            call.add(ident, rhs)
            call.argument_children = [ident, rhs]
            self._sw_type_assign(call)
            out.append(call)
        self._accept(";")
        return out

    def _sw_type_assign(self, n: PNode) -> None:
        """`x = C()` — a direct call to an Uppercase name is an
        initializer invocation; record C on the target local and link
        the call to `C.init` (swiftsrc2cpg's init resolution)."""
        if n.label != "CALL" or n.name != "<operator>.assignment":
            return
        args = n.argument_children
        if len(args) != 2 or args[0].label != "IDENTIFIER":
            return
        lhs, rhs = args
        if (
            rhs.label == "CALL"
            and rhs.name
            and rhs.name[:1].isupper()
            and "." not in rhs.name
            and lhs.ref_target is not None
            and lhs.ref_target.label in ("LOCAL", "METHOD_PARAMETER_IN")
            and not lhs.ref_target.type_full_name
        ):
            lhs.ref_target.type_full_name = rhs.name
            lhs.type_full_name = rhs.name
            rhs.method_full_name = f"{rhs.name}.init"

    # ---- control flow ------------------------------------------------------

    def _sw_guard(self) -> PNode:
        """`guard [let x =] cond else { exit }` -> IF whose condition is
        the binding/predicate and whose branch is the else-block (the
        binding defines x for the DDG, matching the reference's
        guard-statement lowering to a negated if)."""
        t = self._expect("guard")
        if self._tok().text in ("let", "var"):
            decls = self._sw_decl()
            cond = decls[-1] if decls and decls[-1].label == "CALL" else None
        else:
            cond = self._parse_expr()
            decls = []
        node = self._new("CONTROL_STRUCTURE", t, name="IF", code="guard")
        if cond is not None:
            node.add(cond)
            node.condition_child = cond
        for d in decls:
            if d.label == "LOCAL":
                node.add(d)
        self._accept("else")
        node.add(self._wrap_single(self._parse_stmt_safe(), t))
        return node

    def _sw_for(self) -> PNode:
        """`for x in xs { }` -> WHILE with the per-iteration binding
        `x = xs` as condition (defines x for the DDG)."""
        t = self._expect("for")
        self._accept("(")
        vt = self._tok()
        self.i += 1
        local = self._new("LOCAL", vt, name=vt.text, code=vt.text)
        self.scopes[-1][vt.text] = local
        if self._tok().text == "in":
            self.i += 1
        src = self._parse_expr()
        self._accept(")")
        ident = self._new("IDENTIFIER", vt, name=vt.text, code=vt.text)
        ident.ref_target = local
        cond = self._new(
            "CALL", t, name="<operator>.assignment",
            method_full_name="<operator>.assignment",
            dispatch_type=STATIC_DISPATCH,
            code=f"{vt.text} = {src.code}",
        )
        cond.add(ident, src)
        cond.argument_children = [ident, src]
        n = self._new("CONTROL_STRUCTURE", t, name="WHILE", code="for-in")
        n.condition_child = cond
        blk = self._wrap_single(self._parse_stmt_safe(), t)
        blk.add(local)
        n.add(cond, blk)
        return n

    def _sw_switch(self) -> PNode:
        """`switch subj { case p: stmts... default: stmts }` -> SWITCH
        with IF branch children (same lowering as Kotlin `when`)."""
        t = self._expect("switch")
        subj = self._parse_expr()
        n = self._new("CONTROL_STRUCTURE", t, name="SWITCH", code="switch")
        n.condition_child = subj
        n.add(subj)
        self._expect("{")
        while not self._at_eof() and not self._at("}"):
            before = self.i
            bt = self._tok()
            if bt.text == "case":
                self.i += 1
                wcond = self._parse_expr()
                self._accept(":")
                w = self._new("CONTROL_STRUCTURE", bt, name="IF", code="case")
                w.condition_child = wcond
                w.add(wcond, self._wrap_single(self._sw_case_body(), bt))
                n.add(w)
            elif bt.text == "default":
                self.i += 1
                self._accept(":")
                n.add(self._wrap_single(self._sw_case_body(), bt))
            else:
                self.i += 1
            if self.i == before:
                self.i += 1
        self._accept("}")
        return n

    def _sw_case_body(self) -> list[PNode]:
        out: list[PNode] = []
        while not self._at_eof() and self._tok().text not in ("case", "default", "}"):
            before = self.i
            out.extend(self._parse_stmt_safe())
            if self.i == before:
                self.i += 1
        return out

    # ---- expressions -----------------------------------------------------

    def _parse_call_args(self) -> list[PNode]:
        """Swift labeled arguments `f(x: 1, with: y)` -> positional args
        (label dropped; swiftsrc2cpg keeps labels on ARGUMENT edges, our
        ordinal is positional)."""
        self._expect("(")
        args: list[PNode] = []
        while not self._at_eof() and not self._at(")"):
            if self._tok().kind == "id" and self._at(":", 1):
                self.i += 2
            args.append(self._parse_assign_expr())
            if not self._accept(","):
                break
        self._expect(")")
        return args

    def _parse_if(self) -> PNode:
        """Swift `if [let x =] cond { }` — parens optional."""
        t = self._expect("if")
        if self._tok().text in ("let", "var") and self._tok(1).kind == "id":
            # `if let x` / `if let x = e` optional binding
            self.i += 1
            vt = self._tok()
            self.i += 1
            local = self._new("LOCAL", vt, name=vt.text, code=vt.text)
            self.scopes[-1][vt.text] = local
            ident = self._new("IDENTIFIER", vt, name=vt.text, code=vt.text)
            ident.ref_target = local
            if self._accept("="):
                rhs = self._parse_expr()
            else:  # `if let x { }` shorthand: binds x to itself
                rhs = self._new("IDENTIFIER", vt, name=vt.text, code=vt.text)
            cond = self._new(
                "CALL", t, name="<operator>.assignment",
                method_full_name="<operator>.assignment",
                dispatch_type=STATIC_DISPATCH,
                code=f"{vt.text} = {rhs.code}",
            )
            cond.add(ident, rhs)
            cond.argument_children = [ident, rhs]
        else:
            paren = self._accept("(")
            cond = self._parse_expr()
            if paren:
                self._expect(")")
        node = self._new("CONTROL_STRUCTURE", t, name="IF", code="if")
        node.add(cond)
        node.condition_child = cond
        node.add(self._wrap_single(self._parse_stmt(), t))
        if self._at("else"):
            et = self._tok()
            self.i += 1
            els = self._new("CONTROL_STRUCTURE", et, name="ELSE", code="else")
            els.add(self._wrap_single(self._parse_stmt(), et))
            node.add(els)
        return node

    def _parse_while(self) -> PNode:
        t = self._expect("while")
        self._accept("let")
        paren = self._accept("(")
        cond = self._parse_expr()
        if paren:
            self._expect(")")
        node = self._new("CONTROL_STRUCTURE", t, name="WHILE", code="while")
        node.add(cond)
        node.condition_child = cond
        node.add(self._wrap_single(self._parse_stmt(), t))
        return node

    def _member_call_fqn(self, node: PNode, fname: str) -> str:
        """`Type.f(..)` — an UNRESOLVED Uppercase receiver is a
        type-qualified static call (the import resolver / naive linker
        consume the dotted form downstream)."""
        base = super()._member_call_fqn(node, fname)
        if (
            base == fname
            and node.label == "IDENTIFIER"
            and node.ref_target is None
            and node.name
            and node.name[:1].isupper()
        ):
            return f"{node.name}.{fname}"
        return base
