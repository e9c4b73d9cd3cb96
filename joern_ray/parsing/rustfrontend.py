"""Rust fragment frontend — rustsrc2cpg analog on the shared machinery.

The reference ships a Rust frontend (`joern-cli/frontends/rust2cpg`);
this re-expresses its output shape on the shared PNode IR.  Rust is
brace-shaped with `fn`/`let` declarations, so the frontend rides the JS
dialect of `FragmentParser` (statement/expression machinery) and adds
the Rust-specific layer:

- `use a::b::c;` -> IMPORT named `a.b.c`
- `fn name(x: T) -> R { }` -> METHOD with typed params/signature
- `struct S { f: T }` -> TYPE_DECL + MEMBERs; `enum E { .. }` likewise
- `trait T { fn m(&self); }` -> TYPE_DECL with method stubs bound
- `impl S { fn m(&self) }` / `impl Tr for S` -> methods attach to the
  TYPE_DECL for S declared in THIS fragment when present (traits merge
  into its inherits list); a CROSS-fragment impl emits a duplicate
  TYPE_DECL that FullNameUniquenessPass canonicalizes and the
  cross-fragment AstLinkerPass re-links — one AST tree per type either
  way, the same pathway reopened Ruby classes use.
- `let [mut] x[: T] = e;` -> LOCAL + assignment; `S::new()` /
  `S { .. }` initializers type the local so `x.m()` dispatches as S.m
  (SAFEDISPATCH pathway)
- `S::f(..)` path calls -> STATIC_DISPATCH calls named `S.f`
- `match v { p => e, .. }` -> SWITCH with IF branches; `for x in xs` /
  `loop` / `while let` -> the WHILE shapes the CFG builder knows
"""

from __future__ import annotations

from .astmodel import FRAG_PLACEHOLDER, PNode, STATIC_DISPATCH
from .parser import FragmentParser, ParseError

_RS_ITEM_MODIFIERS = frozenset("pub const unsafe async extern crate".split())


class RustFragmentParser(FragmentParser):
    """`parse(src, url, idx)` surface identical to the other frontends;
    one instance per actor, reused across fragments."""

    def __init__(self) -> None:
        super().__init__("javascript")
        self.dialect = "rust"

    # ---- entry -----------------------------------------------------------

    def parse(self, src: str, url: str, fragment_idx: int) -> PNode:
        from .tokenizer import tokenize

        self.src = src
        self.toks = tokenize(src)
        # rust path separator :: rides the shared '.' member machinery
        # (S::new() parses as S.new(); _member_call_fqn qualifies it)
        for t in self.toks:
            if t.text == "::":
                t.text = "."
        self.i = 0
        self.url = url
        self.fragment_idx = fragment_idx
        self.scopes = [{}]
        self.class_members_stack = []
        self.class_name_stack = []
        self.node_count = 0
        self.lambda_counter = 0
        self.lambda_stack = []
        # fragment-local TYPE_DECL registry: `impl S` blocks attach to an
        # S declared in THIS fragment instead of emitting a duplicate
        # decl (which would double every method's AST edge through the
        # AstLinkerPass); cross-fragment impls still emit the duplicate
        # that canonicalization + AstLinkerPass unify.
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
            raise ParseError("empty rust fragment")
        n_meaningful = 0
        while not self._at_eof():
            start = self.i
            try:
                for n in self._rs_item():
                    if n.label == "IMPORT":
                        root.add(n)
                        root.extra_edges.append(("IMPORTS", n))
                    else:
                        root.add(n)
                    n_meaningful += 1
            except ParseError:
                self._sync(start, root)
            if self.i == start:
                self.i += 1
        if n_meaningful == 0:
            raise ParseError("no rust items found")
        return root

    # ---- items -------------------------------------------------------------

    def _rs_item(self) -> list[PNode]:
        t = self._tok()
        txt = t.text
        if txt == "#":  # attribute  #[derive(..)]
            self.i += 1
            if self._at("["):
                self._skip_balanced("[", "]")
            return []
        while t.kind == "id" and txt in _RS_ITEM_MODIFIERS:
            self.i += 1
            t = self._tok()
            txt = t.text
        if txt == "use":
            return self._rs_use()
        if txt == "mod" and self._tok(1).kind == "id":
            # `mod m { items }` — parse inner items at top level
            self.i += 2
            if self._accept("{"):
                return []  # items inside parse on subsequent iterations
            self._accept(";")
            return []
        if txt == "fn" and self._tok(1).kind == "id":
            return [self._rs_fn()]
        if txt in ("struct", "enum") and self._tok(1).kind == "id":
            return [self._rs_struct(txt)]
        if txt == "trait" and self._tok(1).kind == "id":
            return [self._rs_trait()]
        if txt == "impl":
            return self._rs_impl()
        if txt == "}":  # mod-block close
            self.i += 1
            return []
        # top-level statement (const decls, stray exprs in snippets)
        out = self._parse_stmt_safe()
        for n in out:
            self._rs_type_assign(n)
        return out

    def _rs_use(self) -> list[PNode]:
        t = self._expect("use")
        parts: list[str] = []
        while self._tok().kind == "id":
            parts.append(self._tok().text)
            self.i += 1
            if not self._accept("."):
                break
        if self._at("{"):  # use a::{b, c}; — record the prefix
            self._skip_balanced("{", "}")
        if self._at("*"):
            self.i += 1
        self._accept(";")
        if not parts:
            return []
        imp = ".".join(parts)
        return [self._new("IMPORT", t, name=imp, code=f"use {imp}")]

    def _rs_type(self) -> str:
        """Consume `: Type` (refs, paths, generics); returns type text."""
        if not self._accept(":"):
            return ""
        while self._tok().text in ("&", "&&", "mut"):
            self.i += 1
        if self._tok().kind != "id":
            return ""
        typ = self._tok().text
        self.i += 1
        while self._at(".") and self._tok(1).kind == "id":
            typ += "." + self._tok(1).text
            self.i += 2
        if self._at("<"):
            self._skip_balanced("<", ">")
        return typ

    def _rs_params(self) -> list[PNode]:
        params: list[PNode] = []
        self._expect("(")
        while not self._at_eof() and not self._at(")"):
            while self._tok().text in ("&", "&&", "mut"):
                self.i += 1
            pt = self._tok()
            if pt.text == "self":  # receiver — implicit, no param node
                self.i += 1
                self._accept(",")
                continue
            if pt.kind != "id":
                self.i += 1
                continue
            self.i += 1
            typ = self._rs_type()
            p = self._new(
                "METHOD_PARAMETER_IN", pt, name=pt.text, code=pt.text,
                type_full_name=typ,
            )
            params.append(p)
            self._accept(",")
        self._accept(")")
        return params

    def _rs_ret_type(self) -> str:
        if self._accept("->"):
            while self._tok().text in ("&", "&&", "mut"):
                self.i += 1
            if self._tok().kind == "id":
                r = self._tok().text
                self.i += 1
                while self._at(".") and self._tok(1).kind == "id":
                    r += "." + self._tok(1).text
                    self.i += 2
                if self._at("<"):
                    self._skip_balanced("<", ">")
                return r
            if self._at("("):  # unit/tuple return
                self._skip_balanced("(", ")")
        return "ANY"

    def _rs_fn(self) -> PNode:
        t = self._expect("fn")
        name_t = self._tok()
        self.i += 1
        if self._at("<"):
            self._skip_balanced("<", ">")
        cls = self.class_name_stack[-1] if self.class_name_stack else ""
        fqn = f"{cls}.{name_t.text}" if cls else name_t.text
        self.scopes.append({})
        m = self._new(
            "METHOD", t, name=name_t.text, full_name=fqn, signature="",
            code=f"fn {name_t.text}",
        )
        params = self._rs_params()
        for p in params:
            m.add(p)
            self.scopes[-1][p.name] = p
        ret = self._rs_ret_type()
        if self._tok().text == "where":
            while not self._at_eof() and not self._at("{") and not self._at(";"):
                self.i += 1
        m.signature = f"{ret}({','.join((p.type_full_name or 'ANY') for p in params)})"
        if self._at("{"):
            body = self._parse_block()
        else:
            self._accept(";")  # trait method prototype
            body = self._new("BLOCK", name_t, code="<body>")
        self._finish_method(m, body, ret)
        self.scopes.pop()
        return m

    def _rs_struct(self, kw: str) -> PNode:
        t = self._expect(kw)
        name_t = self._tok()
        self.i += 1
        if self._at("<"):
            self._skip_balanced("<", ">")
        td = self._new(
            "TYPE_DECL", t, name=name_t.text, full_name=name_t.text,
            code=f"{kw} {name_t.text}", type_full_name="",
        )
        self._local_tds.setdefault(name_t.text, td)
        if self._at("("):  # tuple struct
            self._skip_balanced("(", ")")
            self._accept(";")
            return td
        if not self._at("{"):
            self._accept(";")
            return td
        self._expect("{")
        while not self._at_eof() and not self._at("}"):
            before = self.i
            if self._at("#"):
                self.i += 1
                if self._at("["):
                    self._skip_balanced("[", "]")
                continue
            while self._tok().text in ("pub",):
                self.i += 1
            ft = self._tok()
            if ft.kind == "id":
                self.i += 1
                if kw == "struct":
                    typ = self._rs_type()
                    mem = self._new(
                        "MEMBER", ft, name=ft.text, code=ft.text,
                        type_full_name=typ,
                    )
                    mem.full_name = f"{name_t.text}.{ft.text}"
                    td.add(mem)
                else:  # enum variant (payload skipped)
                    if self._at("("):
                        self._skip_balanced("(", ")")
                    if self._at("{"):
                        self._skip_balanced("{", "}")
                    mem = self._new(
                        "MEMBER", ft, name=ft.text, code=ft.text,
                    )
                    mem.full_name = f"{name_t.text}.{ft.text}"
                    td.add(mem)
                self._accept(",")
            if self.i == before:
                self.i += 1
        self._accept("}")
        return td

    def _rs_trait(self) -> PNode:
        t = self._expect("trait")
        name_t = self._tok()
        self.i += 1
        if self._at("<"):
            self._skip_balanced("<", ">")
        td = self._new(
            "TYPE_DECL", t, name=name_t.text, full_name=name_t.text,
            code=f"trait {name_t.text}", type_full_name="",
        )
        self.class_name_stack.append(name_t.text)
        self.class_members_stack.append({})
        if self._at("{"):
            self._expect("{")
            while not self._at_eof() and not self._at("}"):
                before = self.i
                tt = self._tok()
                if tt.kind == "id" and tt.text in _RS_ITEM_MODIFIERS:
                    self.i += 1
                elif tt.text == "fn" and self._tok(1).kind == "id":
                    m = self._rs_fn()
                    td.add(m)
                    td.extra_edges.append(("BINDS", m))
                else:
                    self.i += 1
                if self.i == before:
                    self.i += 1
            self._accept("}")
        self.class_members_stack.pop()
        self.class_name_stack.pop()
        return td

    def _rs_impl(self) -> list[PNode]:
        """`impl S { .. }` / `impl Tr for S { .. }` — methods attach to
        the TYPE_DECL for S declared in THIS fragment when one exists
        (no duplicate decl, no doubled AST edges); otherwise a new
        TYPE_DECL named S is emitted and canonicalization + the
        cross-fragment AstLinkerPass unify it with S's declaring
        fragment — one AST tree per type either way."""
        t = self._expect("impl")
        if self._at("<"):
            self._skip_balanced("<", ">")
        first = self._tok()
        if first.kind != "id":
            raise ParseError("impl target")
        self.i += 1
        if self._at("<"):
            self._skip_balanced("<", ">")
        trait = ""
        name = first.text
        if self._tok().text == "for":
            self.i += 1
            trait = first.text
            nt = self._tok()
            if nt.kind != "id":
                raise ParseError("impl-for target")
            name = nt.text
            self.i += 1
            if self._at("<"):
                self._skip_balanced("<", ">")
        existing = self._local_tds.get(name)
        if existing is not None:
            td = existing
            if trait:
                prev = td.type_full_name or ""
                parts = [p_ for p_ in prev.split(";") if p_]
                if trait not in parts:
                    parts.append(trait)
                td.type_full_name = ";".join(parts)
            fresh = False
        else:
            td = self._new(
                "TYPE_DECL", t, name=name, full_name=name,
                code=f"impl {name}", type_full_name=trait,
            )
            self._local_tds[name] = td
            fresh = True
        self.class_name_stack.append(name)
        self.class_members_stack.append({})
        self._expect("{")
        while not self._at_eof() and not self._at("}"):
            before = self.i
            tt = self._tok()
            if tt.text == "#":
                self.i += 1
                if self._at("["):
                    self._skip_balanced("[", "]")
            elif tt.kind == "id" and tt.text in _RS_ITEM_MODIFIERS:
                self.i += 1
            elif tt.text == "fn" and self._tok(1).kind == "id":
                m = self._rs_fn()
                td.add(m)
                td.extra_edges.append(("BINDS", m))
            else:
                self.i += 1
            if self.i == before:
                self.i += 1
        self._accept("}")
        self.class_members_stack.pop()
        self.class_name_stack.pop()
        return [td] if fresh else []

    # ---- statements ----------------------------------------------------

    def _parse_stmt(self) -> list[PNode]:
        t = self._tok()
        txt = t.text
        if txt == "let":
            return self._rs_let()
        if txt == "match":
            return [self._rs_match()]
        if txt == "for":
            return [self._rs_for()]
        if txt == "loop":
            return [self._rs_loop()]
        out = super()._parse_stmt()
        for n in out:
            self._rs_type_assign(n)
        return out

    def _rs_let(self) -> list[PNode]:
        kw = self._expect("let")
        self._accept("mut")
        name_t = self._tok()
        if name_t.kind != "id":
            return []
        self.i += 1
        typ = self._rs_type()
        local = self._new(
            "LOCAL", name_t, name=name_t.text, code=name_t.text,
            type_full_name=typ,
        )
        self.scopes[-1][name_t.text] = local
        out: list[PNode] = [local]
        if self._accept("="):
            ident = self._new("IDENTIFIER", name_t, name=name_t.text, code=name_t.text)
            ident.ref_target = local
            rhs = self._rs_init_expr()
            call = self._new(
                "CALL", kw, name="<operator>.assignment",
                method_full_name="<operator>.assignment",
                dispatch_type=STATIC_DISPATCH,
                code=f"{name_t.text} = {rhs.code}",
            )
            call.add(ident, rhs)
            call.argument_children = [ident, rhs]
            self._rs_type_assign(call)
            out.append(call)
        self._accept(";")
        return out

    def _rs_init_expr(self) -> PNode:
        """RHS of a let: handles the struct-literal `S { f: e, .. }` form
        (which the C-family expression parser can't), else defers."""
        t = self._tok()
        if (
            t.kind == "id"
            and t.text[:1].isupper()
            and self._at("{", 1)
        ):
            self.i += 1
            start = self.i
            self._skip_balanced("{", "}")
            alloc = self._new(
                "CALL", t, name="<operator>.alloc",
                method_full_name="<operator>.alloc",
                dispatch_type=STATIC_DISPATCH,
                code=f"{t.text} {{..}}",
                type_full_name=t.text,
            )
            return alloc
        return self._parse_assign_expr()

    def _rs_type_assign(self, n: PNode) -> None:
        """`let x = S::new()` / `S { .. }` -> record S on the local."""
        if n.label != "CALL" or n.name != "<operator>.assignment":
            return
        args = n.argument_children
        if len(args) != 2 or args[0].label != "IDENTIFIER":
            return
        lhs, rhs = args
        typ = ""
        if rhs.label == "CALL" and rhs.type_full_name:
            typ = rhs.type_full_name  # struct literal alloc
        elif (
            rhs.label == "CALL"
            and rhs.method_full_name
            and "." in (rhs.method_full_name or "")
            and rhs.method_full_name.split(".")[0][:1].isupper()
        ):
            head, tail = rhs.method_full_name.rsplit(".", 1)
            if tail in ("new", "default", "create"):
                typ = head
        if (
            typ
            and lhs.ref_target is not None
            and lhs.ref_target.label in ("LOCAL", "METHOD_PARAMETER_IN")
            and not lhs.ref_target.type_full_name
        ):
            lhs.ref_target.type_full_name = typ
            lhs.type_full_name = typ

    def _rs_match(self) -> PNode:
        """`match subj { pat => stmt, .. }` -> SWITCH with IF branches
        (same lowering as the kotlin when / ruby case)."""
        t = self._expect("match")
        subj = self._parse_expr()
        n = self._new("CONTROL_STRUCTURE", t, name="SWITCH", code="match")
        n.condition_child = subj
        n.add(subj)
        self._expect("{")
        while not self._at_eof() and not self._at("}"):
            before = self.i
            bt = self._tok()
            # pattern: consume tokens through '=>'
            depth = 0
            is_default = bt.text == "_"
            while not self._at_eof() and not (depth == 0 and self._at("=>")):
                tx = self._tok().text
                if tx in ("(", "[", "{"):
                    depth += 1
                elif tx in (")", "]", "}"):
                    if depth == 0:
                        break
                    depth -= 1
                self.i += 1
            if not self._accept("=>"):
                break
            if self._at("{"):
                arm = self._parse_block()
            else:
                # single assignment-level expression — _parse_stmt would
                # swallow the following arms through the comma operator
                try:
                    arm = self._wrap_single([self._parse_assign_expr()], bt)
                except ParseError:
                    arm = self._new("BLOCK", bt, code="<arm>")
            if is_default:
                n.add(arm)
            else:
                w = self._new("CONTROL_STRUCTURE", bt, name="IF", code="match-arm")
                cond = self._new("LITERAL", bt, code=bt.text, type_full_name="boolean")
                w.condition_child = cond
                w.add(cond, arm)
                n.add(w)
            self._accept(",")
            if self.i == before:
                self.i += 1
        self._accept("}")
        return n

    def _rs_for(self) -> PNode:
        """`for x in xs { }` -> WHILE with the per-iteration binding."""
        t = self._expect("for")
        vt = self._tok()
        self.i += 1
        local = self._new("LOCAL", vt, name=vt.text, code=vt.text)
        self.scopes[-1][vt.text] = local
        if self._tok().text == "in":
            self.i += 1
        src = self._parse_expr()
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
        blk = self._parse_block() if self._at("{") else self._wrap_single(
            self._parse_stmt_safe(), t
        )
        blk.add(local)
        n.add(cond, blk)
        return n

    def _rs_loop(self) -> PNode:
        t = self._expect("loop")
        n = self._new("CONTROL_STRUCTURE", t, name="WHILE", code="loop")
        cond = self._new("LITERAL", t, code="true", type_full_name="boolean")
        n.condition_child = cond
        blk = self._parse_block() if self._at("{") else self._wrap_single(
            self._parse_stmt_safe(), t
        )
        n.add(cond, blk)
        return n

    def _parse_if(self) -> PNode:
        """Rust `if cond { }` — parens optional (the C-family base
        requires them); `if let pat = e` rides the expression parser."""
        t = self._expect("if")
        self._accept("let")
        paren = self._accept("(")
        cstart = self.i
        cond = self._parse_expr()
        ccode = self._slice(cstart)
        if paren:
            self._expect(")")
        node = self._new("CONTROL_STRUCTURE", t, name="IF", code=f"if ({ccode})")
        node.add(cond)
        node.condition_child = cond
        then_nodes = self._parse_stmt()
        node.add(self._wrap_single(then_nodes, t))
        if self._at("else"):
            et = self._tok()
            self.i += 1
            else_nodes = self._parse_stmt()
            els = self._new("CONTROL_STRUCTURE", et, name="ELSE", code="else")
            els.add(self._wrap_single(else_nodes, et))
            node.add(els)
        return node

    def _parse_while(self) -> PNode:
        t = self._expect("while")
        self._accept("let")
        paren = self._accept("(")
        cstart = self.i
        cond = self._parse_expr()
        ccode = self._slice(cstart)
        if paren:
            self._expect(")")
        node = self._new(
            "CONTROL_STRUCTURE", t, name="WHILE", code=f"while ({ccode})"
        )
        node.add(cond)
        node.condition_child = cond
        node.add(self._wrap_single(self._parse_stmt(), t))
        return node

    # ---- expressions -----------------------------------------------------

    def _parse_primary(self) -> PNode:
        """Struct-literal `S { f: e }` in expression position -> alloc
        CALL typed S (Uppercase heuristic, rust's own if-condition
        restriction keeps this unambiguous in practice)."""
        t = self._tok()
        if t.kind == "id" and t.text[:1].isupper() and self._at("{", 1):
            self.i += 1
            self._skip_balanced("{", "}")
            return self._new(
                "CALL", t, name="<operator>.alloc",
                method_full_name="<operator>.alloc",
                dispatch_type=STATIC_DISPATCH,
                code=f"{t.text} {{..}}",
                type_full_name=t.text,
            )
        return super()._parse_primary()

    def _member_call_fqn(self, node: PNode, fname: str) -> str:
        """`S::f(..)` arrives as receiver S (unresolved Uppercase id) —
        a path call, STATIC to `S.f` (rust2cpg path resolution)."""
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
