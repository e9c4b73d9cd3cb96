"""Ruby fragment frontend — rubysrc2cpg analog on the shared machinery.

The reference ships a Ruby frontend (`joern-cli/frontends/rubysrc2cpg`,
`AstCreator` + `RubyNodeCreator`); this re-expresses its output shape on
the shared PNode IR: `def`/`end` methods, `class C < D` TYPE_DECLs with
INHERITS handles, `module` TYPE_DECLs, `attr_accessor` MEMBERs,
`require` IMPORTs, `@ivar` as self fieldAccess, `:sym` literals,
`do |x| ... end` blocks as method-ref arguments (the reference lowers
Ruby blocks to lambda methods too), and `X.new` constructor calls
qualified to `X.initialize` so cross-document linking reaches the real
constructor definition.

EXPRESSIONS reuse `FragmentParser`'s Pratt parser unchanged (Ruby's
operator grammar is close enough to C's for web-corpus snippets); only
the statement layer differs — keyword-introduced, `end`-delimited,
newline-terminated.  Statements are recognized at token positions;
expressions naturally stop at statement boundaries because a bare
newline leaves no infix operator to continue on.

Typed-receiver dispatch: `h = Handler.new` records Handler on the
LOCAL, so later `h.handle(x)` emits method_full_name "Handler.handle"
with DYNAMIC_DISPATCH — the same pathway SAFEDISPATCH candidates and
the shuffle linker consume for every other frontend.
"""

from __future__ import annotations

from .astmodel import DYNAMIC_DISPATCH, FRAG_PLACEHOLDER, OPERATORS, PNode, STATIC_DISPATCH
from .parser import FragmentParser, ParseError
from .tokenizer import tokenize

_RB_KEYWORDS = frozenset(
    "def end class module if elsif else unless while until case when begin "
    "rescue ensure return break next require require_relative raise do then "
    "attr_accessor attr_reader attr_writer yield".split()
)

# statement-start ids that introduce a paren-less "command call"
_COMMANDS = frozenset("puts print p pp raise yield require require_relative".split())


class RubyFragmentParser(FragmentParser):
    """`parse(src, url, idx)` surface identical to the other frontends;
    one instance per actor, reused across fragments."""

    def __init__(self) -> None:
        super().__init__("c")
        self.dialect = "ruby"

    # ---- entry -----------------------------------------------------------

    def parse(self, src: str, url: str, fragment_idx: int) -> PNode:
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
        self.pending_locals: list[PNode] = []
        root = PNode(
            "NAMESPACE_BLOCK",
            name="<global>",
            full_name=f"{FRAG_PLACEHOLDER}:<global>",
            code="<global>",
            line=1,
            col=1,
        )
        self.node_count += 1
        mod = PNode(
            "METHOD",
            name="<module>",
            full_name=f"<module>@{FRAG_PLACEHOLDER}",
            signature="",
            code="<module>",
            line=1,
            col=1,
        )
        self.node_count += 1
        body = PNode("BLOCK", code="<module>", line=1, col=1)
        self.node_count += 1
        n_meaningful = 0
        while not self._at_eof():
            before = self.i
            for n in self._rb_stmt_safe():
                if n.label in ("METHOD", "TYPE_DECL"):
                    root.add(n)
                    n_meaningful += 1
                elif n.label == "IMPORT":
                    root.add(n)
                    root.extra_edges.append(("IMPORTS", n))
                    n_meaningful += 1
                else:
                    self._drain_locals(body)
                    body.add(n)
                    n_meaningful += 1
            if self.i == before:
                self.i += 1
        if n_meaningful == 0:
            raise ParseError("no ruby statements found")
        self._drain_locals(body)
        self._finish_method(mod, body, "ANY")
        root.add(mod)
        return root

    # ---- plumbing --------------------------------------------------------

    def _drain_locals(self, container: PNode) -> None:
        for loc in self.pending_locals:
            container.add(loc)
        self.pending_locals.clear()

    def _rb_stmt_safe(self) -> list[PNode]:
        start = self.i
        try:
            return self._rb_stmt()
        except ParseError:
            raise
        except Exception:  # noqa: BLE001 — per-statement tolerance
            self.i = max(self.i, start + 1)
            t = self.toks[start] if start < len(self.toks) else None
            if t is None:
                return []
            return [self._new("UNKNOWN", t, code=t.text)]

    def _kw(self, *names: str) -> bool:
        t = self._tok()
        return t.kind == "id" and t.text in names

    def _rb_body(self, *terminators: str) -> PNode:
        """Statements until one of `terminators` at statement position
        (NOT consumed).  Block scope is function-flat, like python."""
        t0 = self._tok()
        b = PNode("BLOCK", code="<block>", line=t0.line, col=t0.col)
        self.node_count += 1
        while not self._at_eof() and not self._kw(*terminators):
            before = self.i
            for n in self._rb_stmt_safe():
                self._drain_locals(b)
                b.add(n)
            if self.i == before:
                self.i += 1
        self._drain_locals(b)
        return b

    # ---- statements ------------------------------------------------------

    def _rb_stmt(self) -> list[PNode]:
        t = self._tok()
        txt = t.text
        if t.kind == "id":
            if txt == "def":
                return [self._rb_def()]
            if txt in ("class", "module"):
                return [self._rb_class(txt)]
            if txt in ("if", "unless"):
                return [self._rb_if(txt)]
            if txt in ("while", "until"):
                return [self._rb_while(txt)]
            if txt == "case":
                return [self._rb_case()]
            if txt == "begin":
                return [self._rb_begin()]
            if txt == "return":
                self.i += 1
                r = self._new("RETURN", t, code="return")
                if not self._at_eof() and self._tok().line == t.line:
                    v = self._parse_expr()
                    r.add(v)
                    r.argument_children.append(v)
                return self._rb_modifier([r], t)
            if txt == "break":
                self.i += 1
                return [self._new("CONTROL_STRUCTURE", t, name="BREAK", code="break")]
            if txt == "next":
                self.i += 1
                return [self._new("CONTROL_STRUCTURE", t, name="CONTINUE", code="next")]
            if txt in ("require", "require_relative"):
                self.i += 1
                nt = self._tok()
                if nt.kind == "str":
                    self.i += 1
                    imp = nt.text.strip("\"'")
                    imp = self._new("IMPORT", t, name=imp, code=f"require {imp}")
                    return [imp]
                return []
            if txt in ("attr_accessor", "attr_reader", "attr_writer"):
                self.i += 1
                out: list[PNode] = []
                while self._at(":") and self._tok(1).kind == "id":
                    name_t = self._tok(1)
                    self.i += 2
                    mem = self._new(
                        "MEMBER", name_t, name=name_t.text, code=f":{name_t.text}"
                    )
                    if self.class_members_stack:
                        self.class_members_stack[-1][name_t.text] = mem
                        if self.class_name_stack:
                            mem.full_name = (
                                f"{self.class_name_stack[-1]}.{name_t.text}"
                            )
                    out.append(mem)
                    self._accept(",")
                return out
            if txt == "raise":
                self.i += 1
                n = self._new("CONTROL_STRUCTURE", t, name="THROW", code="raise")
                if not self._at_eof() and self._tok().line == t.line:
                    n.add(self._parse_expr())
                return [n]
            if txt in _COMMANDS or (
                txt not in _RB_KEYWORDS
                and self._tok(1).line == t.line
                and (
                    self._tok(1).kind in ("str", "num")
                    or self._tok(1).text in (":", "@")
                )
            ):
                # paren-less command call: `puts x`, `handler.call 1` is
                # NOT this shape (dot calls go through the Pratt parser)
                if txt in _COMMANDS or self._tok(1).kind in ("str", "num") or (
                    self._tok(1).text in (":", "@")
                ):
                    return self._rb_modifier([self._rb_command(t)], t)
        # default: expression statement (+ optional `do |x| ... end`)
        e = self._parse_expr()
        self._rb_record_instance_type(e)
        if self._kw("do"):
            self._rb_attach_block(e)
        return self._rb_modifier([e], t)

    def _rb_modifier(self, nodes: list[PNode], t0) -> list[PNode]:
        """Trailing `expr if cond` / `expr unless cond` modifiers."""
        if self._kw("if", "unless") and self._tok().line == t0.line:
            kw = self._tok()
            self.i += 1
            cond = self._parse_expr()
            n = self._new(
                "CONTROL_STRUCTURE", kw, name="IF", code=f"{kw.text} <modifier>"
            )
            n.condition_child = cond
            blk = PNode("BLOCK", code="<block>", line=kw.line, col=kw.col)
            self.node_count += 1
            for x in nodes:
                blk.add(x)
            n.add(cond, blk)
            return [n]
        return nodes

    def _rb_command(self, t) -> PNode:
        """`puts x, y` — paren-less call with newline-terminated args."""
        self.i += 1
        call = self._new(
            "CALL",
            t,
            name=t.text,
            method_full_name=t.text,
            dispatch_type=STATIC_DISPATCH,
            code=t.text,
        )
        while (
            not self._at_eof()
            and self._tok().line == t.line
            and not self._kw("if", "unless", "do", "end")
        ):
            a = self._parse_assign_expr()
            call.add(a)
            call.argument_children.append(a)
            if not self._accept(","):
                break
        return call

    def _rb_if(self, kw: str) -> PNode:
        t = self._expect(kw)
        n = self._new("CONTROL_STRUCTURE", t, name="IF", code=kw)
        cond = self._parse_expr()
        if kw == "unless":
            neg = self._new(
                "CALL",
                t,
                name="<operator>.logicalNot",
                method_full_name="<operator>.logicalNot",
                dispatch_type=STATIC_DISPATCH,
                code=f"!({cond.code})",
            )
            neg.add(cond)
            neg.argument_children.append(cond)
            cond = neg
        self._accept_kw("then")
        n.condition_child = cond
        n.add(cond)
        n.add(self._rb_body("elsif", "else", "end"))
        if self._kw("elsif"):
            n.add(self._wrap_block([self._rb_if_elsif()]))
        elif self._kw("else"):
            self.i += 1
            n.add(self._rb_body("end"))
        self._accept_kw("end")
        return n

    def _rb_if_elsif(self) -> PNode:
        """`elsif` parses like a nested if whose `end` belongs to the
        outermost if — consume it there."""
        t = self._expect("elsif")
        n = self._new("CONTROL_STRUCTURE", t, name="IF", code="elsif")
        cond = self._parse_expr()
        self._accept_kw("then")
        n.condition_child = cond
        n.add(cond)
        n.add(self._rb_body("elsif", "else", "end"))
        if self._kw("elsif"):
            n.add(self._wrap_block([self._rb_if_elsif()]))
        elif self._kw("else"):
            self.i += 1
            n.add(self._rb_body("end"))
        return n

    def _wrap_block(self, nodes: list[PNode]) -> PNode:
        b = PNode(
            "BLOCK", code="<block>", line=nodes[0].line, col=nodes[0].col
        )
        self.node_count += 1
        for x in nodes:
            b.add(x)
        return b

    def _accept_kw(self, name: str) -> bool:
        if self._kw(name):
            self.i += 1
            return True
        return False

    def _rb_while(self, kw: str) -> PNode:
        t = self._expect(kw)
        n = self._new("CONTROL_STRUCTURE", t, name="WHILE", code=kw)
        cond = self._parse_expr()
        if kw == "until":
            neg = self._new(
                "CALL",
                t,
                name="<operator>.logicalNot",
                method_full_name="<operator>.logicalNot",
                dispatch_type=STATIC_DISPATCH,
                code=f"!({cond.code})",
            )
            neg.add(cond)
            neg.argument_children.append(cond)
            cond = neg
        self._accept_kw("do")
        n.condition_child = cond
        n.add(cond, self._rb_body("end"))
        self._accept_kw("end")
        return n

    def _rb_case(self) -> PNode:
        t = self._expect("case")
        subject = self._parse_expr()
        n = self._new("CONTROL_STRUCTURE", t, name="SWITCH", code="case")
        n.condition_child = subject
        n.add(subject)
        while self._kw("when"):
            wt = self._tok()
            self.i += 1
            wcond = self._parse_expr()
            self._accept_kw("then")
            w = self._new("CONTROL_STRUCTURE", wt, name="IF", code="when")
            w.condition_child = wcond
            w.add(wcond, self._rb_body("when", "else", "end"))
            n.add(w)
        if self._kw("else"):
            self.i += 1
            n.add(self._rb_body("end"))
        self._accept_kw("end")
        return n

    def _rb_begin(self) -> PNode:
        t = self._expect("begin")
        n = self._new("CONTROL_STRUCTURE", t, name="TRY", code="begin")
        n.add(self._rb_body("rescue", "ensure", "end"))
        while self._kw("rescue"):
            rt = self._tok()
            self.i += 1
            # `rescue ExcType => e` — skip the filter clause
            while (
                not self._at_eof()
                and self._tok().line == rt.line
                and not self._kw("then")
            ):
                self.i += 1
            self._accept_kw("then")
            c = self._new("CONTROL_STRUCTURE", rt, name="CATCH", code="rescue")
            c.add(self._rb_body("rescue", "ensure", "end"))
            n.add(c)
        if self._kw("ensure"):
            ft = self._tok()
            self.i += 1
            f = self._new("CONTROL_STRUCTURE", ft, name="FINALLY", code="ensure")
            f.add(self._rb_body("end"))
            n.add(f)
        self._accept_kw("end")
        return n

    # ---- defs ------------------------------------------------------------

    def _rb_def(self) -> PNode:
        t = self._expect("def")
        self_method = False
        if self._kw("self") and self._tok(1).text == ".":
            self.i += 2
            self_method = True
        name_t = self._tok()
        self.i += 1
        name = name_t.text
        # operator methods (`def ==`, `def []`) — name from punct tokens
        while name_t.kind == "punct" and self._tok().kind == "punct" and self._tok().line == name_t.line and self._tok().text in ("]", "="):
            name += self._tok().text
            self.i += 1
        cls = self.class_name_stack[-1] if self.class_name_stack else ""
        fqn = f"{cls}.{name}" if cls else name
        del self_method  # joern ruby keeps C.m for both instance + class methods
        self.scopes.append({})
        m = self._new(
            "METHOD", t, name=name, full_name=fqn, signature="", code=f"def {name}"
        )
        params: list[str] = []
        if self._at("("):
            self.i += 1
            while not self._at_eof() and not self._at(")"):
                pt = self._tok()
                if pt.kind == "id":
                    params.append(pt.text)
                    self.i += 1
                    if self._accept("="):  # default value
                        self._parse_conditional()
                else:
                    self.i += 1
                self._accept(",")
            self._accept(")")
        else:
            # paren-less params on the def line
            while (
                not self._at_eof()
                and self._tok().line == name_t.line
                and self._tok().kind == "id"
                and self._tok().text not in _RB_KEYWORDS
            ):
                params.append(self._tok().text)
                self.i += 1
                if not self._accept(","):
                    break
        for pname in params:
            p = self._new(
                "METHOD_PARAMETER_IN", name_t, name=pname, code=pname
            )
            m.add(p)
            self.scopes[-1][pname] = p
        m.signature = f"ANY({','.join(['ANY'] * len(params))})"
        body = self._rb_body("end", "rescue")
        # trailing method-level rescue clauses
        while self._kw("rescue"):
            rt = self._tok()
            self.i += 1
            while not self._at_eof() and self._tok().line == rt.line and not self._kw("then"):
                self.i += 1
            c = self._new("CONTROL_STRUCTURE", rt, name="CATCH", code="rescue")
            c.add(self._rb_body("rescue", "end"))
            body.add(c)
        self._accept_kw("end")
        self._finish_method(m, body, "ANY")
        self.scopes.pop()
        return m

    def _rb_class(self, kw: str) -> PNode:
        t = self._expect(kw)
        name_t = self._tok()
        self.i += 1
        parents = ""
        if self._accept("<"):
            pt = self._tok()
            self.i += 1
            parents = pt.text
        td = self._new(
            "TYPE_DECL",
            t,
            name=name_t.text,
            full_name=name_t.text,
            code=f"{kw} {name_t.text}",
            type_full_name=parents,
        )
        self.class_name_stack.append(name_t.text)
        self.class_members_stack.append({})
        while not self._at_eof() and not self._kw("end"):
            before = self.i
            for n in self._rb_stmt_safe():
                if n.label == "METHOD":
                    td.add(n)
                    td.extra_edges.append(("BINDS", n))
                elif n.label == "MEMBER":
                    td.add(n)
                else:
                    td.add(n)
            if self.i == before:
                self.i += 1
        self._accept_kw("end")
        self.class_members_stack.pop()
        self.class_name_stack.pop()
        return td

    # ---- expression extensions ------------------------------------------

    def _parse_primary(self) -> PNode:
        t = self._tok()
        # :symbol literal
        if t.text == ":" and self._tok(1).kind == "id":
            self.i += 2
            return self._new(
                "LITERAL", t, code=f":{self.toks[self.i - 1].text}",
                type_full_name="symbol",
            )
        # array / hash literal -> arrayInitializer (Joern Operators)
        if t.text in ("[", "{"):
            close = "]" if t.text == "[" else "}"
            self.i += 1
            call = self._new(
                "CALL",
                t,
                name="<operator>.arrayInitializer",
                method_full_name="<operator>.arrayInitializer",
                dispatch_type=STATIC_DISPATCH,
                code=t.text,
            )
            while not self._at_eof() and not self._at(close):
                before = self.i
                el = self._parse_assign_expr()
                call.add(el)
                call.argument_children.append(el)
                if not self._accept(",") and not self._accept("=>"):
                    if self.i == before:
                        self.i += 1
                    if not self._at(close):
                        continue
            self._accept(close)
            return call
        # @ivar / @@cvar -> self fieldAccess (the reference lowers
        # instance variables to self.<name> member accesses)
        if t.text == "@":
            self.i += 1
            if self._at("@"):
                self.i += 1
            name_t = self._tok()
            if name_t.kind != "id":
                return self._new("UNKNOWN", t, code="@")
            self.i += 1
            base = self._new("IDENTIFIER", t, name="self", code="self")
            fid = self._new(
                "FIELD_IDENTIFIER", name_t, name=name_t.text, code=name_t.text
            )
            if self.class_members_stack and name_t.text in self.class_members_stack[-1]:
                fid.ref_target = self.class_members_stack[-1][name_t.text]
            call = self._new(
                "CALL",
                t,
                name=OPERATORS["."],
                method_full_name=OPERATORS["."],
                dispatch_type=STATIC_DISPATCH,
                code=f"@{name_t.text}",
            )
            if fid.ref_target is None and self.class_name_stack:
                call.full_name = f"{self.class_name_stack[-1]}.{name_t.text}"
            call.add(base, fid)
            call.argument_children = [base, fid]
            return call
        return super()._parse_primary()

    def _make_field_access(self, node, fname_tok, op, start):
        """Ruby `base.name` without parens IS a zero-arg method call
        (attribute reads go through getters) — except as an assignment
        TARGET (`a.name = x`), which stays a fieldAccess so the
        assignment lowering and DDG defs keep their shape."""
        nxt = self._tok().text
        if nxt == "=" or fname_tok.text[:1].isupper() or not fname_tok.text[:1].isalpha():
            return super()._make_field_access(node, fname_tok, op, start)
        mfn = self._member_call_fqn(node, fname_tok.text)
        call = self._new(
            "CALL",
            fname_tok,
            name=fname_tok.text,
            method_full_name=mfn,
            dispatch_type=DYNAMIC_DISPATCH,
            code=self._slice(start),
            line=node.line,
            col=node.col,
        )
        node.argument_index = 0
        call.add(node)
        call.receiver_child = node
        return call

    def _member_call_fqn(self, node: PNode, fname: str) -> str:
        """Ruby receivers: `self` qualifies to the enclosing class;
        a Constant receiver is a class-method call (`X.new`, `X.create`)
        qualified by the constant itself, with `new` mapped to the
        `initialize` definition (reference rubysrc2cpg lowers `.new` to
        the constructor)."""
        if node.code == "self" and self.class_name_stack:
            recv = self.class_name_stack[-1]
            return f"{recv}.{fname}"
        if (
            node.label == "IDENTIFIER"
            and node.name
            and node.name[:1].isupper()
            and not node.type_full_name
        ):
            target = "initialize" if fname == "new" else fname
            return f"{node.name}.{target}"
        if fname == "new" and node.type_full_name:
            return f"{node.type_full_name}.initialize"
        return super()._member_call_fqn(node, fname)

    # ---- receiver typing + blocks ---------------------------------------

    def _rb_record_instance_type(self, e: PNode) -> None:
        """Assignment post-processing: Ruby assignments DECLARE locals
        (no `var`), so an unresolved lhs identifier materializes a LOCAL
        in the current scope; `h = Handler.new` additionally records
        Handler on that LOCAL so later `h.handle(x)` dispatches as
        Handler.handle."""
        if e.label != "CALL" or e.name != "<operator>.assignment":
            return
        args = e.argument_children
        if len(args) != 2:
            return
        lhs, rhs = args
        if lhs.label != "IDENTIFIER":
            return
        if lhs.ref_target is None and lhs.name:
            loc = PNode(
                "LOCAL", name=lhs.name, code=lhs.name, line=lhs.line, col=lhs.col
            )
            self.node_count += 1
            self.scopes[-1][lhs.name] = loc
            self.pending_locals.append(loc)
            lhs.ref_target = loc
        if rhs.label == "CALL" and rhs.method_full_name.endswith(".initialize"):
            cls = rhs.method_full_name.rsplit(".", 1)[0]
            if lhs.ref_target is not None and lhs.ref_target.label in (
                "LOCAL",
                "METHOD_PARAMETER_IN",
            ):
                lhs.ref_target.type_full_name = cls
                lhs.type_full_name = cls

    def _rb_attach_block(self, e: PNode) -> None:
        """`expr.each do |x| ... end` — the block lowers to a lambda
        METHOD passed as a METHOD_REF argument (reference lowers Ruby
        blocks the same way)."""
        t = self._expect("do")
        self.lambda_counter += 1
        fqn = f"<block>{self.lambda_counter}@{FRAG_PLACEHOLDER}"
        m = self._new(
            "METHOD", t, name="<block>", full_name=fqn, signature="", code="do-block"
        )
        self.scopes.append({})
        if self._at("|"):
            self.i += 1
            while not self._at_eof() and not self._at("|"):
                pt = self._tok()
                if pt.kind == "id":
                    p = self._new(
                        "METHOD_PARAMETER_IN", pt, name=pt.text, code=pt.text
                    )
                    m.add(p)
                    self.scopes[-1][pt.text] = p
                self.i += 1
                self._accept(",")
            self._accept("|")
        body = self._rb_body("end")
        self._accept_kw("end")
        self._finish_method(m, body, "ANY")
        self.scopes.pop()
        ref = self._new(
            "METHOD_REF", t, name="<block>", method_full_name=fqn, code="do-block"
        )
        ref.add(m)
        if e.label == "CALL":
            e.add(ref)
            e.argument_children.append(ref)
