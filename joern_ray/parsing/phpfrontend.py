"""PHP fragment frontend — php2cpg analog on the shared machinery.

The reference ships a PHP frontend (`joern-cli/frontends/php2cpg`,
`AstCreator` over php-parser JSON); this re-expresses its output shape
on the shared PNode IR.  PHP's statement grammar is C/JS-shaped (braces,
semicolons, C-style if/while/for/switch/return), so the frontend rides
the JS dialect of `FragmentParser` and adds only the PHP-specific
layer: `<?php`/`?>` tag stripping (same-length, offsets preserved),
`class C extends D` TYPE_DECLs with visibility-modifier members,
`function` methods (the shared `$`-tolerant tokenizer reads `$x` as one
identifier), `echo`/`print` statement calls, `foreach (... as ...)`
lowered to the WHILE shape the CFG builder knows,
`require`/`include`/`use` IMPORTs, `$this->m()` qualified to the
enclosing class and `$x = new C()` receiver typing feeding
SAFEDISPATCH — the same pathway as every other frontend.
"""

from __future__ import annotations

from .astmodel import FRAG_PLACEHOLDER, PNode, STATIC_DISPATCH
from .parser import FragmentParser, ParseError
from .tokenizer import tokenize

_VISIBILITY = frozenset(
    "public private protected static final abstract var readonly".split()
)


def _strip_tags(src: str) -> str:
    """Blank out `<?php` / `<?=` / `?>` with same-length spaces so all
    byte offsets (code slices, line/col) stay aligned.

    String-literal aware: a `?>` inside `echo "a?>b"` (or a `<?` in a
    quoted HTML/regex payload) is part of the literal's text and must
    survive — a regex over the whole source corrupted such literals.
    Single-char scanner tracking quote state ('...' / "..." with \\
    escapes); tags inside comments are still blanked (harmless)."""
    out = list(src)
    i, n = 0, len(src)
    quote: str | None = None
    while i < n:
        ch = src[i]
        if quote is not None:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            i += 1
            continue
        if ch == "<" and src.startswith("<?", i):
            ln = 5 if src.startswith("<?php", i) else 3 if src.startswith("<?=", i) else 2
            out[i : i + ln] = " " * ln
            i += ln
            continue
        if ch == "?" and src.startswith("?>", i):
            out[i : i + 2] = "  "
            i += 2
            continue
        i += 1
    return "".join(out)


class PhpFragmentParser(FragmentParser):
    """`parse(src, url, idx)` surface identical to the other frontends;
    one instance per actor, reused across fragments."""

    def __init__(self) -> None:
        super().__init__("javascript")
        self.dialect = "php"

    # ---- entry -----------------------------------------------------------

    def parse(self, src: str, url: str, fragment_idx: int) -> PNode:
        self.src = _strip_tags(src)
        self.toks = tokenize(self.src)
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
        # php2cpg wraps top-level statements in a `<global>` METHOD; we
        # keep the jssrc-style program method for shared-machinery parity
        prog = self._make_method_shell(
            ":program", f":program@{FRAG_PLACEHOLDER}", "", [], "ANY",
            self.toks[0] if self.toks else None,
        ) if self.toks else None
        if prog is None:
            raise ParseError("empty php fragment")
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
            raise ParseError("no php statements found")
        self._finish_method(prog, body, "ANY")
        self.lambda_stack.pop()
        self.scopes.pop()
        root.add(prog)
        return root

    # ---- statements ------------------------------------------------------

    def _parse_stmt(self) -> list[PNode]:
        t = self._tok()
        txt = t.text
        if txt == "class" and self._tok(1).kind == "id":
            return [self._php_class()]
        if txt in ("echo", "print"):
            return [self._php_echo()]
        if txt == "foreach":
            return [self._php_foreach()]
        if txt in ("require", "require_once", "include", "include_once"):
            return self._php_require(t)
        if txt == "use" and self._tok(1).kind == "id":
            return self._php_use(t)
        out = super()._parse_stmt()
        extra: list[PNode] = []
        for n in out:
            loc = self._php_type_assign(n)
            if loc is not None:
                extra.append(loc)
        return extra + out

    def _php_require(self, t) -> list[PNode]:
        self.i += 1
        paren = self._accept("(")
        nt = self._tok()
        out: list[PNode] = []
        if nt.kind == "str":
            self.i += 1
            imp = nt.text.strip("\"'")
            out.append(self._new("IMPORT", t, name=imp, code=f"require {imp}"))
        if paren:
            self._accept(")")
        self._accept(";")
        return out

    def _php_use(self, t) -> list[PNode]:
        self.i += 1
        parts = [self._tok().text]
        self.i += 1
        while self._at("\\") or self._at("\\\\"):
            self.i += 1
            if self._tok().kind == "id":
                parts.append(self._tok().text)
                self.i += 1
        imp = ".".join(parts)
        self._accept(";")
        return [self._new("IMPORT", t, name=imp, code=f"use {imp}")]

    def _php_echo(self) -> PNode:
        t = self._tok()
        self.i += 1
        call = self._new(
            "CALL",
            t,
            name=t.text,
            method_full_name=t.text,
            dispatch_type=STATIC_DISPATCH,
            code=t.text,
        )
        while not self._at_eof() and not self._at(";"):
            a = self._parse_assign_expr()
            call.add(a)
            call.argument_children.append(a)
            if not self._accept(","):
                break
        self._accept(";")
        return call

    def _php_foreach(self) -> PNode:
        """`foreach ($arr as [$k =>] $v) body` -> WHILE whose condition
        is the per-iteration binding `$v = $arr` (defines $v for the
        DDG), same lowering as the python/ruby for-loops."""
        t = self._expect("foreach")
        self._expect("(")
        arr = self._parse_assign_expr()
        if self._tok().text == "as":
            self.i += 1
        vt = self._tok()
        if vt.kind == "id":
            self.i += 1
            if self._at("=>"):
                self.i += 1
                vt = self._tok()
                self.i += 1
        local = self._new("LOCAL", vt, name=vt.text, code=vt.text)
        self.scopes[-1][vt.text] = local
        ident = self._new("IDENTIFIER", vt, name=vt.text, code=vt.text)
        ident.ref_target = local
        cond = self._new(
            "CALL",
            t,
            name="<operator>.assignment",
            method_full_name="<operator>.assignment",
            dispatch_type=STATIC_DISPATCH,
            code=f"{vt.text} = {arr.code}",
        )
        cond.add(ident, arr)
        cond.argument_children = [ident, arr]
        self._expect(")")
        n = self._new("CONTROL_STRUCTURE", t, name="WHILE", code="foreach")
        n.condition_child = cond
        body_nodes = self._parse_stmt_safe()
        blk = self._wrap_single(body_nodes, t)
        blk.add(local)
        n.add(cond, blk)
        return n

    def _php_class(self) -> PNode:
        t = self._expect("class")
        name_t = self._tok()
        self.i += 1
        parents = ""
        if self._tok().text == "extends":
            self.i += 1
            parents = self._tok().text
            self.i += 1
        while self._tok().text == "implements" or self._at(","):
            self.i += 1
            if self._tok().kind == "id":
                self.i += 1
        td = self._new(
            "TYPE_DECL",
            t,
            name=name_t.text,
            full_name=name_t.text,
            code=f"class {name_t.text}",
            type_full_name=parents,
        )
        self.class_name_stack.append(name_t.text)
        self.class_members_stack.append({})
        self._expect("{")
        while not self._at_eof() and not self._at("}"):
            before = self.i
            while self._tok().kind == "id" and self._tok().text in _VISIBILITY:
                self.i += 1
            mt = self._tok()
            if mt.text == "function" and self._tok(1).kind == "id":
                self.i += 1
                fname = self._tok()
                self.i += 1
                m = self._parse_function_rest(fname, "ANY", name_t.text)
                if m is not None:
                    td.add(m)
                    td.extra_edges.append(("BINDS", m))
            elif mt.kind == "id" and mt.text.startswith("$"):
                # property: public $x [= default];
                self.i += 1
                mem = self._new(
                    "MEMBER", mt, name=mt.text.lstrip("$"), code=mt.text
                )
                mem.full_name = f"{name_t.text}.{mt.text.lstrip('$')}"
                self.class_members_stack[-1][mt.text.lstrip("$")] = mem
                td.add(mem)
                if self._accept("="):
                    self._parse_assign_expr()
                self._accept(";")
            elif mt.text == "const" and self._tok(1).kind == "id":
                self.i += 1
                ct = self._tok()
                self.i += 1
                mem = self._new("MEMBER", ct, name=ct.text, code=f"const {ct.text}")
                mem.full_name = f"{name_t.text}.{ct.text}"
                td.add(mem)
                if self._accept("="):
                    self._parse_assign_expr()
                self._accept(";")
            else:
                self.i += 1
            if self.i == before:
                self.i += 1
        self._accept("}")
        self.class_members_stack.pop()
        self.class_name_stack.pop()
        return td

    # ---- receiver typing + qualification --------------------------------

    def _php_type_assign(self, n: PNode) -> "PNode | None":
        """`$x = new C()` records C on a (synthesized) LOCAL for $x, so
        later `$x->m()` dispatches as C.m.  PHP has no declarations, so
        the first assignment to an unbound name also materializes its
        LOCAL (returned for block placement)."""
        if n.label != "CALL" or n.name != "<operator>.assignment":
            return None
        args = n.argument_children
        if len(args) != 2 or args[0].label != "IDENTIFIER":
            return None
        lhs, rhs = args
        created = None
        if lhs.ref_target is None and lhs.name:
            created = PNode(
                "LOCAL", name=lhs.name, code=lhs.name, line=lhs.line, col=lhs.col
            )
            self.node_count += 1
            self.scopes[-1][lhs.name] = created
            lhs.ref_target = created
        if (
            rhs.label == "CALL"
            and rhs.name == "<operator>.alloc"
            and rhs.type_full_name
            and lhs.ref_target is not None
            and lhs.ref_target.label in ("LOCAL", "METHOD_PARAMETER_IN")
        ):
            lhs.ref_target.type_full_name = rhs.type_full_name
            lhs.type_full_name = rhs.type_full_name
        return created

    def _member_call_fqn(self, node: PNode, fname: str) -> str:
        """`$this->m()` qualifies to the enclosing class (php2cpg's
        $this receiver); typed receivers ride the shared pathway."""
        if node.code == "$this" and self.class_name_stack:
            return f"{self.class_name_stack[-1]}.{fname}"
        return super()._member_call_fqn(node, fname)
