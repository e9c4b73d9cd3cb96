"""Kotlin fragment frontend — kotlin2cpg analog on the shared machinery.

The reference ships a Kotlin frontend (`joern-cli/frontends/kotlin2cpg`,
`AstCreator` over the Kotlin PSI); this re-expresses its output shape
on the shared PNode IR.  Kotlin statements are brace/C-shaped, so the
frontend rides the JS dialect of `FragmentParser` and adds the
Kotlin-specific layer: `fun name(p: T): R` declarations (block or
single-expression bodies), `class C(...) : D() { ... }` TYPE_DECLs
with primary-constructor `val`/`var` properties as MEMBERs, `object`
declarations, `val`/`var` locals with `x = C()` constructor typing
feeding SAFEDISPATCH, `for (x in xs)` and `when` lowerings to the
WHILE/SWITCH shapes the CFG builder knows, and `import a.b.c` IMPORTs.
"""

from __future__ import annotations

from .astmodel import FRAG_PLACEHOLDER, PNode, STATIC_DISPATCH
from .parser import FragmentParser, ParseError

_KT_MODIFIERS = frozenset(
    "public private protected internal open final abstract override data "
    "sealed inner lateinit const suspend inline operator infix".split()
)


class KotlinFragmentParser(FragmentParser):
    """`parse(src, url, idx)` surface identical to the other frontends;
    one instance per actor, reused across fragments."""

    def __init__(self) -> None:
        super().__init__("javascript")
        self.dialect = "kotlin"

    # ---- entry -----------------------------------------------------------

    def parse(self, src: str, url: str, fragment_idx: int) -> PNode:
        from .tokenizer import tokenize

        self.src = src
        self.toks = tokenize(src)
        self.i = 0
        self.url = url
        self.fragment_idx = fragment_idx
        self.scopes = [{}]
        self.class_members_stack = []
        self.class_name_stack = []
        self.node_count = 0
        self.lambda_counter = 0
        self.lambda_stack = []
        root = PNode(
            "NAMESPACE_BLOCK",
            name="<global>",
            full_name=f"{FRAG_PLACEHOLDER}:<global>",
            code="<global>",
            line=1,
            col=1,
        )
        self.node_count += 1
        if not self.toks:
            raise ParseError("empty kotlin fragment")
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
            raise ParseError("no kotlin statements found")
        self._finish_method(prog, body, "ANY")
        self.lambda_stack.pop()
        self.scopes.pop()
        root.add(prog)
        return root

    # ---- statements ------------------------------------------------------

    def _parse_stmt(self) -> list[PNode]:
        t = self._tok()
        txt = t.text
        while t.kind == "id" and txt in _KT_MODIFIERS and self._tok(1).kind == "id":
            self.i += 1
            t = self._tok()
            txt = t.text
        if txt == "fun" and self._tok(1).kind == "id":
            return [self._kt_fun()]
        if txt in ("class", "object", "interface") and self._tok(1).kind == "id":
            return [self._kt_class(txt)]
        if txt in ("val", "var"):
            return self._kt_decl()
        if txt == "when":
            return [self._kt_when()]
        if txt == "for":
            return [self._kt_for()]
        if txt == "import":
            self.i += 1
            parts = []
            while self._tok().kind == "id":
                parts.append(self._tok().text)
                self.i += 1
                if not self._accept("."):
                    break
            imp = ".".join(parts)
            if not imp:
                return []
            node = self._new("IMPORT", t, name=imp, code=f"import {imp}")
            return [node]
        if txt == "package":
            self.i += 1
            while self._tok().kind == "id":
                self.i += 1
                if not self._accept("."):
                    break
            return []
        out = super()._parse_stmt()
        for n in out:
            self._kt_type_assign(n)
        return out

    def _kt_type(self) -> str:
        """Consume `: Type[<...>][?]`, return the type text (empty if no
        annotation at the cursor)."""
        if not self._accept(":"):
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
        self._accept("?")
        return typ

    def _kt_params(self, as_members: "PNode | None" = None) -> list[PNode]:
        """`(p: T, val q: U = d)` — returns METHOD_PARAMETER_IN nodes;
        `val`/`var` params additionally become MEMBERs of `as_members`
        (primary-constructor properties, kotlin2cpg's member lowering)."""
        params: list[PNode] = []
        self._expect("(")
        while not self._at_eof() and not self._at(")"):
            is_prop = False
            while self._tok().kind == "id" and self._tok().text in _KT_MODIFIERS:
                self.i += 1
            if self._tok().text in ("val", "var"):
                is_prop = True
                self.i += 1
            pt = self._tok()
            if pt.kind != "id":
                self.i += 1
                continue
            self.i += 1
            typ = self._kt_type()
            if self._accept("="):
                self._parse_conditional()
            p = self._new(
                "METHOD_PARAMETER_IN", pt, name=pt.text, code=pt.text,
                type_full_name=typ,
            )
            params.append(p)
            if is_prop and as_members is not None and self.class_name_stack:
                mem = self._new("MEMBER", pt, name=pt.text, code=pt.text,
                                type_full_name=typ)
                mem.full_name = f"{self.class_name_stack[-1]}.{pt.text}"
                self.class_members_stack[-1][pt.text] = mem
                as_members.add(mem)
            self._accept(",")
        self._accept(")")
        return params

    def _kt_fun(self) -> PNode:
        t = self._expect("fun")
        name_t = self._tok()
        self.i += 1
        cls = self.class_name_stack[-1] if self.class_name_stack else ""
        fqn = f"{cls}.{name_t.text}" if cls else name_t.text
        self.scopes.append({})
        m = self._new(
            "METHOD", t, name=name_t.text, full_name=fqn, signature="",
            code=f"fun {name_t.text}",
        )
        params = self._kt_params()
        for p in params:
            m.add(p)
            self.scopes[-1][p.name] = p
        ret = self._kt_type() or "ANY"
        m.signature = f"{ret}({','.join((p.type_full_name or 'ANY') for p in params)})"
        if self._accept("="):
            # single-expression body
            body = self._new("BLOCK", name_t, code="<body>")
            r = self._new("RETURN", name_t, code="return")
            v = self._parse_expr()
            r.add(v)
            r.argument_children.append(v)
            body.add(r)
        elif self._at("{"):
            body = self._parse_block()
        else:
            body = self._new("BLOCK", name_t, code="<body>")
        self._finish_method(m, body, ret)
        self.scopes.pop()
        return m

    def _kt_class(self, kw: str) -> PNode:
        t = self._expect(kw)
        name_t = self._tok()
        self.i += 1
        td = self._new(
            "TYPE_DECL", t, name=name_t.text, full_name=name_t.text,
            code=f"{kw} {name_t.text}", type_full_name="",
        )
        self.class_name_stack.append(name_t.text)
        self.class_members_stack.append({})
        if self._at("("):
            ctor_params = self._kt_params(as_members=td)
            # primary constructor — kotlin2cpg emits C.<init>; our `.new`
            # analog: a METHOD named C.init so C(...) ctor calls can link
            ctor = self._new(
                "METHOD", t, name="init", full_name=f"{name_t.text}.init",
                signature=f"ANY({','.join('ANY' for _ in ctor_params)})",
                code=f"{name_t.text}(...)",
            )
            for p in ctor_params:
                ctor.add(p)
            cbody = self._new("BLOCK", t, code="<init>")
            self._finish_method(ctor, cbody, name_t.text)
            td.add(ctor)
            td.extra_edges.append(("BINDS", ctor))
        parents = []
        if self._accept(":"):
            while self._tok().kind == "id":
                pname = self._tok().text
                self.i += 1
                if self._at("("):
                    self._skip_balanced("(", ")")
                parents.append(pname)
                if not self._accept(","):
                    break
        td.type_full_name = ";".join(parents)
        if self._at("{"):
            self._expect("{")
            while not self._at_eof() and not self._at("}"):
                before = self.i
                # body `val`/`var` property declarations are MEMBERs
                # (kotlin2cpg's member lowering) — routed to _kt_decl
                # they became LOCALs and FieldAccessLinkerPass missed them
                j = 0
                while (
                    self._tok(j).kind == "id"
                    and self._tok(j).text in _KT_MODIFIERS
                ):
                    j += 1
                if (
                    self._tok(j).text in ("val", "var")
                    and self._tok(j + 1).kind == "id"
                ):
                    self.i += j
                    for mem in self._kt_member(name_t.text):
                        td.add(mem)
                else:
                    for n in self._parse_stmt_safe():
                        if n.label == "METHOD":
                            td.add(n)
                            td.extra_edges.append(("BINDS", n))
                        else:
                            td.add(n)
                if self.i == before:
                    self.i += 1
            self._accept("}")
        self.class_members_stack.pop()
        self.class_name_stack.pop()
        return td

    def _kt_member(self, cls: str) -> list[PNode]:
        """Class-body `val x[: T] [= e]` -> MEMBER (registered in
        class_members_stack so `this.x` field accesses resolve)."""
        kw = self._tok()
        self.i += 1
        name_t = self._tok()
        if name_t.kind != "id":
            return []
        self.i += 1
        typ = self._kt_type()
        mem = self._new(
            "MEMBER", name_t, name=name_t.text,
            code=f"{kw.text} {name_t.text}", type_full_name=typ,
        )
        mem.full_name = f"{cls}.{name_t.text}"
        if self.class_members_stack:
            self.class_members_stack[-1][name_t.text] = mem
        if self._accept("="):
            self._parse_expr()  # initializer: consumed, lowered to <init> elsewhere
        self._accept(";")
        return [mem]

    def _kt_decl(self) -> list[PNode]:
        """`val x[: T] = e` / `var x[: T] [= e]` -> LOCAL + assignment;
        `x = C()` (uppercase direct call) types the local."""
        kw = self._tok()
        self.i += 1
        name_t = self._tok()
        if name_t.kind != "id":
            return []
        self.i += 1
        typ = self._kt_type()
        local = self._new(
            "LOCAL", name_t, name=name_t.text, code=name_t.text,
            type_full_name=typ,
        )
        self.scopes[-1][name_t.text] = local
        out: list[PNode] = [local]
        if self._accept("="):
            ident = self._new("IDENTIFIER", name_t, name=name_t.text, code=name_t.text)
            ident.ref_target = local
            rhs = self._parse_expr()
            call = self._new(
                "CALL", kw, name="<operator>.assignment",
                method_full_name="<operator>.assignment",
                dispatch_type=STATIC_DISPATCH,
                code=f"{name_t.text} = {rhs.code}",
            )
            call.add(ident, rhs)
            call.argument_children = [ident, rhs]
            self._kt_type_assign(call)
            out.append(call)
        self._accept(";")
        return out

    def _kt_type_assign(self, n: PNode) -> None:
        """`x = C()` — a direct call to an Uppercase name is a
        constructor invocation; record C on the target local."""
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
            and lhs.ref_target is not None
            and lhs.ref_target.label in ("LOCAL", "METHOD_PARAMETER_IN")
            and not lhs.ref_target.type_full_name
        ):
            lhs.ref_target.type_full_name = rhs.name
            lhs.type_full_name = rhs.name
            # the ctor call links to the primary constructor C.init
            rhs.method_full_name = f"{rhs.name}.init"

    def _kt_for(self) -> PNode:
        """`for (x in xs) body` -> WHILE with the per-iteration binding
        `x = xs` as condition (defines x for the DDG)."""
        t = self._expect("for")
        self._expect("(")
        vt = self._tok()
        self.i += 1
        local = self._new("LOCAL", vt, name=vt.text, code=vt.text)
        self.scopes[-1][vt.text] = local
        if self._tok().text == "in":
            self.i += 1
        src = self._parse_expr()
        self._expect(")")
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

    def _kt_when(self) -> PNode:
        """`when (subj) { cond -> stmt ... else -> stmt }` -> SWITCH with
        IF branch children (same lowering as the ruby case/when)."""
        t = self._expect("when")
        n = self._new("CONTROL_STRUCTURE", t, name="SWITCH", code="when")
        if self._at("("):
            self.i += 1
            subj = self._parse_expr()
            self._expect(")")
            n.condition_child = subj
            n.add(subj)
        self._expect("{")
        while not self._at_eof() and not self._at("}"):
            before = self.i
            bt = self._tok()
            if bt.text == "else":
                self.i += 1
                self._accept("->")
                n.add(self._wrap_single(self._parse_stmt_safe(), bt))
            else:
                wcond = self._parse_expr()
                self._accept("->")
                w = self._new("CONTROL_STRUCTURE", bt, name="IF", code="when-branch")
                w.condition_child = wcond
                w.add(wcond, self._wrap_single(self._parse_stmt_safe(), bt))
                n.add(w)
            if self.i == before:
                self.i += 1
        self._accept("}")
        return n
