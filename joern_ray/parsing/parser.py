"""Tolerant recursive-descent parser for C / C++ / Java / JavaScript code
fragments -> Joern-style AST (PNode tree).

Re-expresses the reference frontends' AST creation (c2cpg
`astcreation/AstCreator.scala:47-55` and the x2cpg `AstNodeBuilder`
construction surface, `AstNodeBuilder.scala:60-483`) in pure Python — the
container has no tree-sitter and no JVM.  Design goals, in order:

1. NEVER raise on malformed input — unparseable statements become UNKNOWN
   nodes; an unparseable fragment becomes a reject row upstream (reference
   per-file skip semantics, `c2cpg/.../AstCreationPass.scala:200-215`).
2. Emit the node kinds / properties / edge kinds the reference tests assert
   (`CallTests.scala:25-36`: code, name, order, methodFullName,
   argumentIndex, lineNumber, columnNumber) with Joern's `<operator>.*`
   synthetic-call vocabulary for expressions (SURVEY.md §2.10).
3. Deterministic: output depends only on (src, url, fragment_idx, dialect).
"""

from __future__ import annotations

from .astmodel import DYNAMIC_DISPATCH, FRAG_PLACEHOLDER, OPERATORS, STATIC_DISPATCH, PNode
from .tokenizer import Tok, tokenize

MAX_NODES_PER_FRAGMENT = 50_000  # bail-out analog of reference's 4000-defs guard
MAX_CODE_LEN = 300  # reference shortenCode truncates stored snippets

C_TYPE_KEYWORDS = frozenset(
    "void char short int long float double signed unsigned bool _Bool size_t "
    "ssize_t struct union enum FILE".split()
)
C_QUALIFIERS = frozenset("const static extern volatile register inline restrict".split())
JAVA_TYPE_KEYWORDS = frozenset(
    "void int long short byte char float double boolean String var Object".split()
)
JAVA_MODIFIERS = frozenset(
    "public private protected static final abstract synchronized native transient volatile strictfp default".split()
)
STMT_KEYWORDS = frozenset(
    "if else while do for switch case default return break continue goto try catch finally throw new delete sizeof".split()
)

ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<=", ">>="}
BINARY_PREC = {
    "||": 1,
    "&&": 2,
    "|": 3,
    "^": 4,
    "&": 5,
    "==": 6,
    "!=": 6,
    "<": 7,
    ">": 7,
    "<=": 7,
    ">=": 7,
    "instanceof": 7,
    "<<": 8,
    ">>": 8,
    "+": 9,
    "-": 9,
    "*": 10,
    "/": 10,
    "%": 10,
}


class ParseError(Exception):
    pass


class FragmentParser:
    """One instance per (actor, dialect); `parse()` per fragment."""

    def __init__(self, dialect: str) -> None:
        assert dialect in ("c", "cpp", "java", "javascript")
        self.dialect = dialect
        self.is_java = dialect == "java"
        self.is_js = dialect == "javascript"
        self.is_c_family = dialect in ("c", "cpp")
        self.type_keywords = JAVA_TYPE_KEYWORDS if self.is_java else C_TYPE_KEYWORDS

    # ---- parse entry -----------------------------------------------------

    def parse(self, src: str, url: str, fragment_idx: int) -> PNode:
        self.src = src
        self.toks: list[Tok] = tokenize(src)
        self.i = 0
        self.url = url
        self.fragment_idx = fragment_idx
        self.scopes: list[dict[str, PNode]] = [{}]
        self.class_members_stack: list[dict[str, PNode]] = []
        self.class_name_stack: list[str] = []
        self.node_count = 0
        self.lambda_counter = 0
        self.lambda_stack: list[list[PNode]] = []
        frag_key = FRAG_PLACEHOLDER
        root = PNode(
            "NAMESPACE_BLOCK",
            name="<global>",
            full_name=f"{frag_key}:<global>",
            code="<global>",
            line=1,
            col=1,
        )
        self._emit_imports(root)
        if self.is_c_family:
            self._emit_macros(root)
        if self.is_js:
            # Joern jssrc wraps top-level statements in a `:program` METHOD
            # (jssrc2cpg program structure); named function decls are ALSO
            # attached so they link by name.
            prog = self._make_method_shell(
                ":program", f":program@{frag_key}", "", [], "ANY", self.toks[0]
            )
            body = PNode("BLOCK", code="<program>", line=1, col=1)
            self.scopes.append({})
            self.lambda_stack.append([])
            while not self._at_eof():
                for n in self._parse_stmt_safe():
                    if n.label == "METHOD":
                        root.add(n)  # named funcs under namespace block
                    else:
                        body.add(n)
            self._finish_method(prog, body, "ANY")
            self.lambda_stack.pop()
            self.scopes.pop()
            root.add(prog)
        elif self.is_java:
            self._parse_java_top(root)
        else:
            self._parse_c_top(root)
        return root

    _C_INCLUDE_RE = None  # compiled lazily per class (shared)

    def _emit_imports(self, root: PNode) -> None:
        """IMPORT nodes from #include / require / ES import lines
        (reference `XImportResolverPass.scala:1-46` resolves import
        strings per frontend; Java imports are handled in
        `_parse_java_top`)."""
        import re as _re

        cls = type(self)
        if cls._C_INCLUDE_RE is None:
            cls._C_INCLUDE_RE = {
                "c": _re.compile(r'^\s*#\s*include\s+[<"]([^>"]+)[>"]', _re.M),
                "js_req": _re.compile(r'require\(\s*[\'"]([^\'"]+)[\'"]\s*\)'),
                "js_imp": _re.compile(r'^\s*import\s+.*?from\s+[\'"]([^\'"]+)[\'"]', _re.M),
            }
        found: list[str] = []
        if self.is_c_family:
            found = cls._C_INCLUDE_RE["c"].findall(self.src)
        elif self.is_js:
            found = cls._C_INCLUDE_RE["js_req"].findall(self.src) + cls._C_INCLUDE_RE[
                "js_imp"
            ].findall(self.src)
        for imp in found:
            node = PNode(
                "IMPORT", name=imp, code=f"import {imp}", line=1, col=1
            )
            self.node_count += 1
            root.add(node)
            root.extra_edges.append(("IMPORTS", node))

    _MACRO_RE = None  # compiled lazily per class (shared)
    _IFDEF_RE = None

    def _emit_macros(self, root: PNode) -> None:
        """MacroHandler analog (reference `c2cpg/.../astcreation/
        MacroHandler.scala:1-224`: each expanded macro gets a METHOD node
        so macro invocations are call-linkable).  The tokenizer drops
        preprocessor lines, so function-like `#define N(args) body`
        definitions are lifted here into METHOD nodes with full_name = N —
        invocations parse as ordinary calls and link cross-document
        through the standard machinery (+ canonicalization dedups
        same-name redefinitions).  Object-like defines become LOCAL-less
        TYPE-free IDENTIFIER aliases in the reference; we list them as
        UNKNOWN directive nodes (PreprocessorPass's #define inventory)."""
        import re as _re

        cls = type(self)
        if cls._MACRO_RE is None:
            cls._MACRO_RE = {
                "fn": _re.compile(
                    r"^[ \t]*#[ \t]*define[ \t]+(\w+)\(([^)\n]*)\)[ \t]+(.+)$", _re.M
                ),
                "obj": _re.compile(
                    r"^[ \t]*#[ \t]*define[ \t]+(\w+)[ \t]+([^\n(]+)$", _re.M
                ),
            }
        for m in cls._MACRO_RE["fn"].finditer(self.src):
            name, argstr, _body = m.group(1), m.group(2), m.group(3)
            args = [a.strip() for a in argstr.split(",") if a.strip()]
            line = self.src.count("\n", 0, m.start()) + 1
            meth = PNode(
                "METHOD",
                name=name,
                full_name=name,
                signature="ANY(" + ",".join(["ANY"] * len(args)) + ")",
                code=m.group(0).strip()[:MAX_CODE_LEN],
                line=line,
                col=1,
            )
            self.node_count += 1
            for a in args:
                p = PNode(
                    "METHOD_PARAMETER_IN", name=a, code=a, line=line, col=1
                )
                self.node_count += 1
                meth.add(p)
            body = PNode("BLOCK", code="<macro>", line=line, col=1)
            self.node_count += 1
            meth.add(body)
            ret = PNode("METHOD_RETURN", code="RET", type_full_name="ANY", line=line, col=1)
            self.node_count += 1
            meth.add(ret)
            root.add(meth)
        for m in cls._MACRO_RE["obj"].finditer(self.src):
            line = self.src.count("\n", 0, m.start()) + 1
            node = PNode(
                "UNKNOWN",
                name=m.group(1),
                code=m.group(0).strip()[:MAX_CODE_LEN],
                line=line,
                col=1,
            )
            self.node_count += 1
            root.add(node)
        # conditional-compilation directives (PreprocessorPass's #ifdef
        # listing half, reference `c2cpg/.../passes/PreprocessorPass.
        # scala:14-39`: collects every #if/#ifdef/#ifndef/#elif with its
        # guard symbol): listed as UNKNOWN directive nodes named by the
        # guard, code = the directive line — queryable via
        # `cpg.all().where_label("UNKNOWN").code("#if.*")`.
        if cls._IFDEF_RE is None:
            cls._IFDEF_RE = _re.compile(
                r"^[ \t]*#[ \t]*(ifdef|ifndef|elif|if)\b[ \t]*([^\n]*)$", _re.M
            )
        for m in cls._IFDEF_RE.finditer(self.src):
            guard = (m.group(2) or "").strip()
            gname = _re.match(r"defined\([ \t]*(\w+)[ \t]*\)|\w+", guard)
            name = (
                (gname.group(1) or gname.group(0)) if gname else m.group(1)
            )
            line = self.src.count("\n", 0, m.start()) + 1
            node = PNode(
                "UNKNOWN",
                name=name,
                code=m.group(0).strip()[:MAX_CODE_LEN],
                line=line,
                col=1,
            )
            self.node_count += 1
            root.add(node)

    # ---- token helpers ---------------------------------------------------

    def _tok(self, k: int = 0) -> Tok:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def _at_eof(self) -> bool:
        return self._tok().kind == "eof"

    def _at(self, text: str, k: int = 0) -> bool:
        return self._tok(k).text == text

    def _accept(self, text: str) -> bool:
        if self._at(text):
            self.i += 1
            return True
        return False

    def _expect(self, text: str) -> Tok:
        t = self._tok()
        if t.text != text:
            raise ParseError(f"expected {text!r}, got {t!r}")
        self.i += 1
        return t

    def _slice(self, start_tok: int, end_tok_exclusive: int | None = None) -> str:
        j = (end_tok_exclusive if end_tok_exclusive is not None else self.i) - 1
        j = max(start_tok, min(j, len(self.toks) - 2))
        if start_tok >= len(self.toks) - 1:
            return ""
        a = self.toks[start_tok].start
        b = self.toks[j].end
        s = self.src[a:b]
        return s if len(s) <= MAX_CODE_LEN else s[:MAX_CODE_LEN]

    def _skip_balanced(self, open_t: str, close_t: str) -> None:
        depth = 0
        while not self._at_eof():
            t = self._tok().text
            self.i += 1
            if t == open_t:
                depth += 1
            elif t == close_t:
                depth -= 1
                if depth == 0:
                    return

    def _new(self, label: str, tok: Tok, **kw) -> PNode:
        self.node_count += 1
        if self.node_count > MAX_NODES_PER_FRAGMENT:
            raise ParseError("fragment exceeds node budget")
        kw.setdefault("line", tok.line)
        kw.setdefault("col", tok.col)
        return PNode(label, **kw)

    # ---- scope helpers ---------------------------------------------------

    def _lookup(self, name: str) -> PNode | None:
        for sc in reversed(self.scopes):
            if name in sc:
                return sc[name]
        return None

    # ---- top-level: C / C++ ---------------------------------------------

    def _parse_c_top(self, root: PNode) -> None:
        while not self._at_eof():
            start = self.i
            try:
                n = self._try_parse_c_toplevel()
                if n is not None:
                    root.add(n)
                    continue
                # fall back: statement at top level (globals, stray exprs)
                for s in self._parse_stmt_safe():
                    root.add(s)
            except ParseError:
                self._sync(start, root)
            if self.i == start:  # no progress — force skip
                self.i += 1

    def _try_parse_c_toplevel(self) -> PNode | None:
        if self._at(";"):
            self.i += 1
            return None
        if self._at("typedef"):
            return self._parse_c_typedef()
        if self._tok().text in ("struct", "union", "enum") and self._tok(2).text == "{":
            return self._parse_c_struct()
        save = self.i
        typ = self._try_parse_type()
        if typ is None:
            return None
        t = self._tok()
        if t.kind == "id" and self._tok(1).text == "(":
            name_tok = t
            self.i += 1
            method = self._parse_function_rest(name_tok, typ, class_name="", def_start=save)
            if method is None:  # it was a prototype — consumed through ';'
                return None
            return method
        self.i = save
        return None

    def _parse_c_typedef(self) -> PNode | None:
        """`typedef T Alias;` / `typedef struct {...} Alias;` ->
        TYPE_DECL(Alias) carrying the aliased type as `signature =
        "alias:T"` — exploded into an ALIAS_OF edge by the map-side
        linker (reference `typerelations/AliasLinkerPass.scala:10-28`
        joins TYPE_DECL.aliasTypeFullName ⋈ TYPE)."""
        kw = self._expect("typedef")
        if self._tok().text in ("struct", "union", "enum") and (
            self._tok(1).text == "{" or self._tok(2).text == "{"
        ):
            td = self._parse_c_struct()  # consumed through '}' (+ maybe ';')
            name_tok = self._tok()
            if name_tok.kind == "id":
                self.i += 1
                target = td.full_name
                td.name = name_tok.text
                td.full_name = name_tok.text
                td.signature = f"alias:{target}" if target != "<anonymous>" else ""
            self._accept(";")
            return td
        typ = self._try_parse_type()
        if typ is None:
            raise ParseError("typedef target")
        name_tok = self._tok()
        if name_tok.kind != "id":
            raise ParseError("typedef alias name")
        self.i += 1
        while not self._at_eof() and not self._accept(";"):
            self.i += 1
        return self._new(
            "TYPE_DECL",
            kw,
            name=name_tok.text,
            full_name=name_tok.text,
            signature=f"alias:{typ}",
            code=f"typedef {typ} {name_tok.text}",
        )

    def _parse_c_struct(self) -> PNode:
        kw = self._tok()
        self.i += 1  # struct/union/enum
        name_tok = self._tok()
        name = name_tok.text if name_tok.kind == "id" else "<anonymous>"
        if name_tok.kind == "id":
            self.i += 1
        start = self.i
        td = self._new(
            "TYPE_DECL", kw, name=name, full_name=name, code=f"{kw.text} {name}"
        )
        if self._at("{"):
            self.i += 1
            while not self._at_eof() and not self._at("}"):
                m_start = self.i
                try:
                    typ = self._try_parse_type()
                    if typ is None:
                        raise ParseError("struct member")
                    while True:
                        mt = self._tok()
                        if mt.kind != "id":
                            raise ParseError("struct member name")
                        self.i += 1
                        while self._at("["):
                            self._skip_balanced("[", "]")
                        td.add(
                            self._new(
                                "MEMBER",
                                mt,
                                name=mt.text,
                                # two-key (base type, field) join handle for
                                # the cross-fragment FieldAccessLinkerPass
                                # (`typerelations/FieldAccessLinkerPass.
                                # scala:18-89`)
                                full_name=f"{name}.{mt.text}",
                                code=self._slice(m_start),
                                type_full_name=typ,
                            )
                        )
                        if not self._accept(","):
                            break
                    self._expect(";")
                except ParseError:
                    self._sync(m_start, td)
            self._accept("}")
        self._accept(";")
        return td

    # ---- top-level: Java -------------------------------------------------

    def _parse_java_top(self, root: PNode) -> None:
        while not self._at_eof():
            start = self.i
            try:
                t = self._tok()
                if t.text == "package":
                    while not self._at_eof() and not self._accept(";"):
                        self.i += 1
                    continue
                if t.text == "import":
                    self.i += 1
                    start = self.i
                    while not self._at_eof() and not self._accept(";"):
                        self.i += 1
                    imp = self._slice(start).rstrip(";").strip()
                    node = self._new("IMPORT", t, name=imp, code=f"import {imp}")
                    root.add(node)
                    root.extra_edges.append(("IMPORTS", node))
                    continue
                if t.text == "@":  # annotation
                    self.i += 2
                    if self._at("("):
                        self._skip_balanced("(", ")")
                    continue
                if t.text in JAVA_MODIFIERS:
                    self.i += 1
                    continue
                if t.text in ("class", "interface", "enum"):
                    root.add(self._parse_java_class())
                    continue
                for s in self._parse_stmt_safe():
                    root.add(s)
            except ParseError:
                self._sync(start, root)
            if self.i == start:
                self.i += 1

    def _parse_java_class(self) -> PNode:
        kw = self._tok()
        self.i += 1
        name_tok = self._tok()
        name = name_tok.text if name_tok.kind == "id" else "<anonymous>"
        if name_tok.kind == "id":
            self.i += 1
        if self._at("<"):
            self._skip_balanced("<", ">")
        inherits: list[str] = []
        while self._tok().text in ("extends", "implements"):
            self.i += 1
            while self._tok().kind == "id":
                base = self._parse_qualified_name()
                inherits.append(base)
                if self._at("<"):
                    self._skip_balanced("<", ">")
                if not self._accept(","):
                    break
        td = self._new(
            "TYPE_DECL",
            kw,
            name=name,
            full_name=name,
            code=f"{kw.text} {name}",
            # inherits list rides in type_full_name as ;-joined (exploded by
            # the TypeHierarchy linking stage)
            type_full_name=";".join(inherits),
        )
        self._expect("{")
        # field registry for in-fragment field-access linking (reference
        # `FieldAccessLinkerPass.scala:18-89` joins on (base type, field
        # name) as a later pass; here fields declared before use link at
        # parse time — the common layout)
        self.class_members_stack.append({})
        self.class_name_stack.append(name)
        while not self._at_eof() and not self._at("}"):
            start = self.i
            try:
                member = self._parse_java_member(name)
                if member is not None:
                    td.add(member)
                    if member.label == "METHOD":
                        # simplified BINDS (reference routes via BINDING
                        # nodes; we emit the direct TYPE_DECL->METHOD edge)
                        td.extra_edges.append(("BINDS", member))
                    elif member.label == "MEMBER":
                        self.class_members_stack[-1][member.name] = member
            except ParseError:
                self._sync(start, td)
            if self.i == start:
                self.i += 1
        self.class_members_stack.pop()
        self.class_name_stack.pop()
        self._accept("}")
        return td

    def _parse_java_member(self, class_name: str) -> PNode | None:
        while self._tok().text in JAVA_MODIFIERS:
            self.i += 1
        if self._at("@"):
            self.i += 2
            if self._at("("):
                self._skip_balanced("(", ")")
            return None
        if self._tok().text in ("class", "interface", "enum"):
            return self._parse_java_class()
        if self._at(";"):
            self.i += 1
            return None
        start = self.i
        # constructor: Name (
        if (
            self._tok().kind == "id"
            and self._tok().text == class_name
            and self._tok(1).text == "("
        ):
            name_tok = self._tok()
            self.i += 1
            return self._parse_function_rest(name_tok, class_name, class_name)
        typ = self._try_parse_type()
        if typ is None:
            raise ParseError(f"java member at {self._tok()!r}")
        t = self._tok()
        if t.kind != "id":
            raise ParseError(f"java member name at {t!r}")
        if self._tok(1).text == "(":
            self.i += 1
            m = self._parse_function_rest(t, typ, class_name, def_start=start)
            return m
        # field
        self.i += 1
        field = self._new(
            "MEMBER",
            t,
            name=t.text,
            # FieldAccessLinkerPass join handle (Type.field)
            full_name=f"{class_name}.{t.text}",
            type_full_name=typ,
            code=self._slice(start),
        )
        while not self._at_eof() and not self._accept(";"):
            self.i += 1
        return field

    # ---- functions -------------------------------------------------------

    def _make_method_shell(
        self,
        name: str,
        full_name: str,
        signature: str,
        params: list[tuple[str, str, Tok]],
        ret_type: str,
        tok: Tok,
    ) -> PNode:
        m = self._new(
            "METHOD",
            tok,
            name=name,
            full_name=full_name,
            signature=signature,
            code="",
        )
        for ptyp, pname, ptok in params:
            p = self._new(
                "METHOD_PARAMETER_IN",
                ptok,
                name=pname,
                code=f"{ptyp} {pname}".strip(),
                type_full_name=ptyp,
            )
            m.add(p)
            self.scopes[-1][pname] = p
        return m

    def _finish_method(self, m: PNode, body: PNode, ret_type: str) -> None:
        m.add(body)
        ret = PNode(
            "METHOD_RETURN",
            code="RET",
            type_full_name=ret_type,
            line=m.line,
            col=m.col,
        )
        self.node_count += 1
        m.add(ret)
        # METHOD_PARAMETER_OUT twin + PARAMETER_LINK per parameter-in
        # (reference `MethodDecoratorPass.scala:14-62`)
        for p in [c for c in m.children if c.label == "METHOD_PARAMETER_IN"]:
            out = PNode(
                "METHOD_PARAMETER_OUT",
                name=p.name,
                code=p.code,
                type_full_name=p.type_full_name,
                line=p.line,
                col=p.col,
            )
            self.node_count += 1
            m.add(out)
            p.extra_edges.append(("PARAMETER_LINK", out))
        if self.lambda_stack and self.lambda_stack[-1]:
            for lam in self.lambda_stack[-1]:
                m.add(lam)

    def _parse_params(self) -> list[tuple[str, str, Tok]]:
        """after '(' ... collects (type, name, tok); consumes through ')'."""
        params: list[tuple[str, str, Tok]] = []
        self._expect("(")
        while not self._at_eof() and not self._at(")"):
            if self._accept(","):
                continue
            if self._at("..."):
                self.i += 1
                continue
            start = self.i
            typ = self._try_parse_type() or ""
            t = self._tok()
            if t.kind == "id":
                self.i += 1
                while self._at("["):
                    self._skip_balanced("[", "]")
                params.append((typ, t.text, t))
            elif typ:  # unnamed param like f(int)
                params.append((typ, "", t))
            else:
                # unknown — skip one token to guarantee progress
                self.i += 1
            if self.i == start:
                self.i += 1
        self._accept(")")
        return params

    def _parse_function_rest(
        self, name_tok: Tok, ret_type: str, class_name: str, def_start: int | None = None
    ) -> PNode | None:
        """cursor is at '(' of the parameter list."""
        if def_start is None:
            def_start = self.i - 1
        self.scopes.append({})
        params = self._parse_params()
        # java: throws clause
        while self._tok().text == "throws":
            self.i += 1
            while self._tok().kind == "id":
                self._parse_qualified_name()
                if not self._accept(","):
                    break
        if not self._at("{"):
            # prototype / abstract — consume trailing ';'
            self.scopes.pop()
            self._accept(";")
            return None
        name = name_tok.text
        full_name = f"{class_name}.{name}" if class_name else name
        signature = f"{ret_type}({','.join(p[0] for p in params)})"
        m = self._make_method_shell(
            name, full_name, signature, params, ret_type, name_tok
        )
        self.lambda_stack.append([])
        body = self._parse_block()
        self._finish_method(m, body, ret_type)
        self.lambda_stack.pop()
        self.scopes.pop()
        m.code = self._slice(def_start)
        return m

    # ---- types -----------------------------------------------------------

    def _parse_qualified_name(self) -> str:
        parts = [self._tok().text]
        self.i += 1
        while self._at(".") and self._tok(1).kind == "id":
            self.i += 2
            parts.append(self.toks[self.i - 1].text)
        return ".".join(parts)

    def _try_parse_type(self) -> str | None:
        """Attempt to consume a type; returns the type string or None (cursor
        restored). Heuristic, tolerant: qualifiers + base + generics +
        pointers/refs/arrays."""
        save = self.i
        quals: list[str] = []
        while self._tok().text in C_QUALIFIERS or (
            self.is_java and self._tok().text in JAVA_MODIFIERS
        ):
            quals.append(self._tok().text)
            self.i += 1
        t = self._tok()
        base = None
        if t.text in ("struct", "union", "enum") and self._tok(1).kind == "id":
            base = f"{t.text} {self._tok(1).text}"
            self.i += 2
        elif t.text in self.type_keywords:
            words = [t.text]
            self.i += 1
            # multi-word C types: unsigned long long int ...
            while self._tok().text in self.type_keywords and not self.is_java:
                words.append(self._tok().text)
                self.i += 1
            base = " ".join(words)
        elif t.kind == "id" and self._looks_like_type_name(t.text):
            base = self._parse_qualified_name() if self.is_java else t.text
            if not self.is_java:
                self.i += 1
        if base is None:
            self.i = save
            return None
        if self._at("<"):  # generics — balanced skip, kept in the name
            g0 = self.i
            self._skip_balanced("<", ">")
            base += self.src[self.toks[g0].start : self.toks[self.i - 1].end]
        stars = ""
        while self._tok().text in ("*", "&"):
            stars += self._tok().text
            self.i += 1
        typ = ("".join(q + " " for q in quals if q in ("const", "unsigned"))) + base + stars
        # must be followed by something declarator-ish, else not a type
        nxt = self._tok()
        if nxt.kind != "id" and nxt.text not in (")", ",", "...", "[", "("):
            self.i = save
            return None
        return typ

    def _looks_like_type_name(self, name: str) -> bool:
        """typedef-ish heuristic for non-keyword type names."""
        if self.is_java:
            return name[0].isupper() or name == "var"
        if self.is_js:
            return False
        return name.endswith("_t") or (name[0].isupper() and not name.isupper())

    # ---- statements ------------------------------------------------------

    def _sync(self, err_start: int, parent: PNode) -> None:
        """Error recovery: skip to ';' (consume) or '}' (leave), emit UNKNOWN."""
        while not self._at_eof():
            t = self._tok().text
            if t == ";":
                self.i += 1
                break
            if t in ("}",):
                break
            self.i += 1
        code = self._slice(err_start)
        if code.strip():
            parent.add(
                PNode(
                    "UNKNOWN",
                    code=code,
                    line=self.toks[err_start].line,
                    col=self.toks[err_start].col,
                )
            )
            self.node_count += 1

    def _parse_stmt_safe(self) -> list[PNode]:
        start = self.i
        try:
            return self._parse_stmt()
        except ParseError:
            holder = PNode("BLOCK")
            self._sync(start, holder)
            if self.i == start:
                self.i += 1
            return holder.children

    def _parse_block(self) -> PNode:
        tok = self._tok()
        self._expect("{")
        self.scopes.append({})
        blk = self._new("BLOCK", tok, code="{ ... }")
        while not self._at_eof() and not self._at("}"):
            before = self.i
            for n in self._parse_stmt_safe():
                blk.add(n)
            if self.i == before:
                self.i += 1
        self._accept("}")
        self.scopes.pop()
        return blk

    def _parse_stmt(self) -> list[PNode]:
        t = self._tok()
        txt = t.text
        if txt == "{":
            return [self._parse_block()]
        if txt == ";":
            self.i += 1
            return []
        if txt == "if":
            return [self._parse_if()]
        if txt == "while":
            return [self._parse_while()]
        if txt == "do":
            return [self._parse_do()]
        if txt == "for":
            return [self._parse_for()]
        if txt == "switch":
            return [self._parse_switch()]
        if txt == "return":
            self.i += 1
            node = self._new("RETURN", t, code="return")
            if not self._at(";"):
                start = self.i
                e = self._parse_expr()
                node.add(e)
                node.code = f"return {self._slice(start)}"
            node.argument_children = list(node.children)
            self._accept(";")
            return [node]
        if txt in ("break", "continue"):
            self.i += 1
            self._accept(";")
            return [self._new("CONTROL_STRUCTURE", t, name=txt.upper(), code=txt)]
        if txt == "goto":
            self.i += 1
            lbl = self._tok()
            if lbl.kind == "id":
                self.i += 1
            self._accept(";")
            return [
                self._new(
                    "CONTROL_STRUCTURE", t, name="GOTO", code=f"goto {lbl.text}"
                )
            ]
        if txt == "try":
            return [self._parse_try()]
        if txt == "throw":
            self.i += 1
            node = self._new("CONTROL_STRUCTURE", t, name="THROW", code="throw")
            if not self._at(";"):
                node.add(self._parse_expr())
            self._accept(";")
            return [node]
        # label?
        if (
            t.kind == "id"
            and self._tok(1).text == ":"
            and self._tok(2).text != ":"
            and txt not in STMT_KEYWORDS
        ):
            self.i += 2
            jt = self._new("JUMP_TARGET", t, name=txt, code=f"{txt}:")
            rest = self._parse_stmt() if not self._at_eof() else []
            return [jt, *rest]
        # js function declaration / named function
        if self.is_js and txt == "function" and self._tok(1).kind == "id":
            return [self._parse_js_function()]
        if self.is_js and txt in ("var", "let", "const"):
            return self._parse_js_decl()
        # declaration?
        decl = self._try_parse_declaration()
        if decl is not None:
            return decl
        # expression statement
        start = self.i
        e = self._parse_expr()
        self._accept(";")
        if not e.code:
            e.code = self._slice(start)
        return [e]

    def _parse_if(self) -> PNode:
        t = self._expect("if")
        self._expect("(")
        cstart = self.i
        cond = self._parse_expr()
        ccode = self._slice(cstart)
        self._expect(")")
        node = self._new(
            "CONTROL_STRUCTURE", t, name="IF", code=f"if ({ccode})"
        )
        node.add(cond)
        node.condition_child = cond
        then_nodes = self._parse_stmt()
        then = self._wrap_single(then_nodes, t)
        node.add(then)
        if self._at("else"):
            et = self._tok()
            self.i += 1
            else_nodes = self._parse_stmt()
            els = self._new("CONTROL_STRUCTURE", et, name="ELSE", code="else")
            els.add(self._wrap_single(else_nodes, et))
            node.add(els)
        return node

    def _wrap_single(self, nodes: list[PNode], tok: Tok) -> PNode:
        if len(nodes) == 1:
            return nodes[0]
        blk = self._new("BLOCK", tok, code="{ ... }")
        for n in nodes:
            blk.add(n)
        return blk

    def _parse_while(self) -> PNode:
        t = self._expect("while")
        self._expect("(")
        cstart = self.i
        cond = self._parse_expr()
        ccode = self._slice(cstart)
        self._expect(")")
        node = self._new(
            "CONTROL_STRUCTURE", t, name="WHILE", code=f"while ({ccode})"
        )
        node.add(cond)
        node.condition_child = cond
        node.add(self._wrap_single(self._parse_stmt(), t))
        return node

    def _parse_do(self) -> PNode:
        t = self._expect("do")
        node = self._new("CONTROL_STRUCTURE", t, name="DO", code="do")
        node.add(self._wrap_single(self._parse_stmt(), t))
        self._expect("while")
        self._expect("(")
        cond = self._parse_expr()
        self._expect(")")
        self._accept(";")
        node.add(cond)
        node.condition_child = cond
        return node

    def _parse_for(self) -> PNode:
        t = self._expect("for")
        self._expect("(")
        node = self._new("CONTROL_STRUCTURE", t, name="FOR", code="for (...)")
        self.scopes.append({})
        # init
        if not self._at(";"):
            if self.is_js and self._tok().text in ("var", "let", "const"):
                for n in self._parse_js_decl():  # consumes ';'
                    node.add(n)
            else:
                decl = self._try_parse_declaration()
                if decl is not None:  # consumes ';'
                    for n in decl:
                        node.add(n)
                else:
                    node.add(self._parse_expr())
                    self._accept(";")
        else:
            self.i += 1
        # java/js for-each: `for (T x : coll)` / `for (x of coll)` — the ':'
        # branch is reached when init parsing left us at ':'/'of'
        if self._tok().text in (":", "of", "in") and self._tok().kind in ("punct", "id"):
            self.i += 1
            node.add(self._parse_expr())
            self._expect(")")
            node.add(self._wrap_single(self._parse_stmt(), t))
            self.scopes.pop()
            return node
        # condition
        if not self._at(";"):
            cond = self._parse_expr()
            node.add(cond)
            node.condition_child = cond
        self._accept(";")
        # update
        if not self._at(")"):
            node.add(self._parse_expr())
        self._expect(")")
        node.add(self._wrap_single(self._parse_stmt(), t))
        self.scopes.pop()
        return node

    def _parse_switch(self) -> PNode:
        t = self._expect("switch")
        self._expect("(")
        cond = self._parse_expr()
        self._expect(")")
        node = self._new("CONTROL_STRUCTURE", t, name="SWITCH", code="switch")
        node.add(cond)
        node.condition_child = cond
        blk_tok = self._tok()
        self._expect("{")
        self.scopes.append({})
        blk = self._new("BLOCK", blk_tok, code="{ ... }")
        while not self._at_eof() and not self._at("}"):
            ct = self._tok()
            if ct.text == "case":
                self.i += 1
                estart = self.i
                while not self._at_eof() and not self._at(":"):
                    self.i += 1
                code = self._slice(estart)
                self._accept(":")
                blk.add(
                    self._new("JUMP_TARGET", ct, name="case", code=f"case {code}:")
                )
                continue
            if ct.text == "default":
                self.i += 1
                self._accept(":")
                blk.add(self._new("JUMP_TARGET", ct, name="default", code="default:"))
                continue
            before = self.i
            for n in self._parse_stmt_safe():
                blk.add(n)
            if self.i == before:
                self.i += 1
        self._accept("}")
        self.scopes.pop()
        node.add(blk)
        return node

    def _parse_try(self) -> PNode:
        t = self._expect("try")
        node = self._new("CONTROL_STRUCTURE", t, name="TRY", code="try")
        node.add(self._parse_block())
        while self._tok().text == "catch":
            ct = self._tok()
            self.i += 1
            cs = self._new("CONTROL_STRUCTURE", ct, name="CATCH", code="catch")
            if self._at("("):
                self.scopes.append({})
                self._skip_balanced("(", ")")
                cs.add(self._parse_block())
                self.scopes.pop()
            node.add(cs)
        if self._tok().text == "finally":
            ft = self._tok()
            self.i += 1
            fs = self._new("CONTROL_STRUCTURE", ft, name="FINALLY", code="finally")
            fs.add(self._parse_block())
            node.add(fs)
        return node

    # ---- declarations ----------------------------------------------------

    def _parse_js_decl(self) -> list[PNode]:
        kw = self._tok()
        self.i += 1
        out: list[PNode] = []
        while True:
            t = self._tok()
            if t.kind != "id":
                raise ParseError(f"js decl name at {t!r}")
            self.i += 1
            local = self._new(
                "LOCAL", t, name=t.text, code=t.text, type_full_name="ANY"
            )
            self.scopes[-1][t.text] = local
            out.append(local)
            if self._at("="):
                eq = self._tok()
                self.i += 1
                ident = self._new("IDENTIFIER", t, name=t.text, code=t.text)
                ident.ref_target = local
                rstart = self.i
                rhs = self._parse_assign_expr()
                call = self._new(
                    "CALL",
                    eq,
                    name="<operator>.assignment",
                    method_full_name="<operator>.assignment",
                    dispatch_type=STATIC_DISPATCH,
                    code=f"{t.text} = {self._slice(rstart)}",
                )
                call.add(ident, rhs)
                call.argument_children = [ident, rhs]
                out.append(call)
            if not self._accept(","):
                break
        self._accept(";")
        return out

    def _try_parse_declaration(self) -> list[PNode] | None:
        if self.is_js:
            return None
        save = self.i
        typ = self._try_parse_type()
        if typ is None:
            return None
        t = self._tok()
        if t.kind != "id" or self._tok(1).text == "(":
            # not a simple declaration (could be a call or function) — restore
            self.i = save
            return None
        out: list[PNode] = []
        while True:
            t = self._tok()
            if t.kind != "id":
                raise ParseError(f"decl name at {t!r}")
            self.i += 1
            dims = ""
            while self._at("["):
                b0 = self.i
                self._skip_balanced("[", "]")
                dims += self.src[self.toks[b0].start : self.toks[self.i - 1].end]
            local = self._new(
                "LOCAL",
                t,
                name=t.text,
                code=f"{typ} {t.text}{dims}".strip(),
                type_full_name=typ + dims,
            )
            self.scopes[-1][t.text] = local
            out.append(local)
            if self._at("="):
                eq = self._tok()
                self.i += 1
                ident = self._new("IDENTIFIER", t, name=t.text, code=t.text)
                ident.ref_target = local
                ident.type_full_name = typ
                rstart = self.i
                rhs = self._parse_assign_expr()
                call = self._new(
                    "CALL",
                    eq,
                    name="<operator>.assignment",
                    method_full_name="<operator>.assignment",
                    dispatch_type=STATIC_DISPATCH,
                    code=f"{t.text} = {self._slice(rstart)}",
                )
                call.add(ident, rhs)
                call.argument_children = [ident, rhs]
                out.append(call)
            if not self._accept(","):
                break
        if not self._accept(";"):
            # tolerate missing semicolon at eof
            if not self._at_eof() and not self._at("}"):
                raise ParseError("expected ';' after declaration")
        return out

    # ---- JS functions / lambdas -----------------------------------------

    def _parse_js_function(self) -> PNode:
        ft = self._expect("function")
        name_tok = self._tok()
        name = ""
        if name_tok.kind == "id":
            name = name_tok.text
            self.i += 1
        else:
            name = f"<lambda>{self.lambda_counter}"
            self.lambda_counter += 1
        def_start = self.i - 2
        self.scopes.append({})
        params = self._parse_params()
        m = self._make_method_shell(
            name,
            name if not name.startswith("<lambda>") else f"{name}@{FRAG_PLACEHOLDER}",
            f"ANY({','.join('ANY' for _ in params)})",
            params,
            "ANY",
            name_tok if name_tok.kind == "id" else ft,
        )
        self.lambda_stack.append([])
        body = self._parse_block()
        self._finish_method(m, body, "ANY")
        self.lambda_stack.pop()
        self.scopes.pop()
        m.code = self._slice(def_start)
        return m

    def _parse_lambda(self, params: list[tuple[str, str, Tok]], tok: Tok) -> PNode:
        """java `x -> expr` / js `x => expr` — lift METHOD to the enclosing
        method, return a METHOD_REF expression node."""
        name = f"<lambda>{self.lambda_counter}"
        self.lambda_counter += 1
        full = f"{name}@{FRAG_PLACEHOLDER}"
        self.scopes.append({})
        m = self._make_method_shell(
            name, full, f"ANY({','.join('ANY' for _ in params)})", params, "ANY", tok
        )
        self.lambda_stack.append([])
        if self._at("{"):
            body = self._parse_block()
        else:
            body = self._new("BLOCK", tok, code="{ ... }")
            ret = self._new("RETURN", tok, code="return")
            e = self._parse_assign_expr()
            ret.add(e)
            ret.argument_children = [e]
            body.add(ret)
        self._finish_method(m, body, "ANY")
        self.lambda_stack.pop()
        self.scopes.pop()
        if self.lambda_stack:
            self.lambda_stack[-1].append(m)
        ref = self._new(
            "METHOD_REF", tok, code=name, method_full_name=full, type_full_name=full
        )
        return ref

    # ---- expressions -----------------------------------------------------

    def _parse_expr(self) -> PNode:
        e = self._parse_assign_expr()
        while self._accept(","):  # comma operator / sequence
            e2 = self._parse_assign_expr()
            seq = PNode(
                "BLOCK", code=",", line=e.line, col=e.col
            )
            self.node_count += 1
            seq.add(e, e2)
            e = seq
        return e

    def _parse_assign_expr(self) -> PNode:
        # lambda lookahead: `x ->` (java), `x =>` / `(a, b) =>` (js)
        if self.is_java and self._tok().kind == "id" and self._tok(1).text == "->":
            t = self._tok()
            self.i += 2
            return self._parse_lambda([("ANY", t.text, t)], t)
        if self.is_js:
            if self._tok().kind == "id" and self._tok(1).text == "=>":
                t = self._tok()
                self.i += 2
                return self._parse_lambda([("ANY", t.text, t)], t)
            if self._at("("):
                # possible parenthesized arrow params — lookahead for ') =>'
                save = self.i
                depth = 0
                j = self.i
                while j < len(self.toks) - 1:
                    tx = self.toks[j].text
                    if tx == "(":
                        depth += 1
                    elif tx == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                if j < len(self.toks) - 1 and self.toks[j + 1].text == "=>":
                    t = self._tok()
                    params = self._parse_params()
                    self._expect("=>")
                    return self._parse_lambda(params, t)
                self.i = save
        start = self.i
        lhs = self._parse_conditional()
        t = self._tok()
        if t.text in ASSIGN_OPS:
            self.i += 1
            rhs = self._parse_assign_expr()
            call = self._new(
                "CALL",
                t,
                name=OPERATORS[t.text],
                method_full_name=OPERATORS[t.text],
                dispatch_type=STATIC_DISPATCH,
                code=self._slice(start),
            )
            call.add(lhs, rhs)
            call.argument_children = [lhs, rhs]
            return call
        return lhs

    def _parse_conditional(self) -> PNode:
        start = self.i
        c = self._parse_binary(1)
        if self._at("?"):
            qt = self._tok()
            self.i += 1
            a = self._parse_assign_expr()
            self._expect(":")
            b = self._parse_conditional()
            call = self._new(
                "CALL",
                qt,
                name=OPERATORS["?:"],
                method_full_name=OPERATORS["?:"],
                dispatch_type=STATIC_DISPATCH,
                code=self._slice(start),
            )
            call.add(c, a, b)
            call.argument_children = [c, a, b]
            return call
        return c

    def _parse_binary(self, min_prec: int) -> PNode:
        start = self.i
        lhs = self._parse_unary()
        while True:
            t = self._tok()
            op = t.text
            if op == "instanceof" and self.is_java:
                prec = BINARY_PREC[op]
            elif op in BINARY_PREC and t.kind == "punct":
                prec = BINARY_PREC[op]
            else:
                return lhs
            if prec < min_prec:
                return lhs
            self.i += 1
            rhs = self._parse_binary(prec + 1)
            opname = OPERATORS.get(op, f"<operator>.{op}")
            call = self._new(
                "CALL",
                t,
                name=opname,
                method_full_name=opname,
                dispatch_type=STATIC_DISPATCH,
                code=self._slice(start),
            )
            call.add(lhs, rhs)
            call.argument_children = [lhs, rhs]
            lhs = call

    _PREFIX = {
        "!": "!",
        "~": "~",
        "-": "u-",
        "+": "u+",
        "*": "u*",
        "&": "u&",
        "++": "++pre",
        "--": "--pre",
    }

    def _parse_unary(self) -> PNode:
        t = self._tok()
        txt = t.text
        if txt in self._PREFIX and t.kind == "punct":
            start = self.i
            self.i += 1
            inner = self._parse_unary()
            opname = OPERATORS[self._PREFIX[txt]]
            call = self._new(
                "CALL",
                t,
                name=opname,
                method_full_name=opname,
                dispatch_type=STATIC_DISPATCH,
                code=self._slice(start),
            )
            call.add(inner)
            call.argument_children = [inner]
            return call
        if txt == "sizeof":
            self.i += 1
            call = self._new(
                "CALL",
                t,
                name=OPERATORS["sizeof"],
                method_full_name=OPERATORS["sizeof"],
                dispatch_type=STATIC_DISPATCH,
                code="sizeof",
            )
            if self._at("("):
                a0 = self.i
                self._skip_balanced("(", ")")
                call.code = f"sizeof{self.src[self.toks[a0].start:self.toks[self.i-1].end]}"
            else:
                inner = self._parse_unary()
                call.add(inner)
                call.argument_children = [inner]
            return call
        if txt == "new" and (self.is_java or self.is_js or self.dialect == "cpp"):
            start = self.i
            self.i += 1
            typ = self._try_parse_type() or (
                self._parse_qualified_name() if self._tok().kind == "id" else "ANY"
            )
            call = self._new(
                "CALL",
                t,
                name="<operator>.alloc",
                method_full_name="<operator>.alloc",
                dispatch_type=STATIC_DISPATCH,
                type_full_name=typ,
                code="",
            )
            if self._at("("):
                args = self._parse_call_args()
                for a in args:
                    call.add(a)
                call.argument_children = args
            if self._at("["):
                self._skip_balanced("[", "]")
            if self._at("{"):  # array/obj initializer
                self._skip_balanced("{", "}")
            call.code = self._slice(start)
            return call
        if txt == "delete" and self.dialect == "cpp":
            self.i += 1
            inner = self._parse_unary()
            call = self._new(
                "CALL",
                t,
                name=OPERATORS["delete"],
                method_full_name=OPERATORS["delete"],
                dispatch_type=STATIC_DISPATCH,
                code=f"delete {inner.code}",
            )
            call.add(inner)
            call.argument_children = [inner]
            return call
        # cast: '(' type ')' unary   (C-family only)
        if txt == "(" and self.is_c_family:
            save = self.i
            self.i += 1
            typ = self._try_parse_type()
            if typ is not None and self._at(")"):
                self.i += 1
                nxt = self._tok()
                if nxt.kind in ("id", "num", "str") or nxt.text in ("(", "*", "&", "!", "~", "-"):
                    inner = self._parse_unary()
                    call = self._new(
                        "CALL",
                        t,
                        name=OPERATORS["cast"],
                        method_full_name=OPERATORS["cast"],
                        dispatch_type=STATIC_DISPATCH,
                        type_full_name=typ,
                        code=f"({typ}) {inner.code}",
                    )
                    call.add(inner)
                    call.argument_children = [inner]
                    return call
            self.i = save
        return self._parse_postfix()

    def _parse_call_args(self) -> list[PNode]:
        self._expect("(")
        args: list[PNode] = []
        while not self._at_eof() and not self._at(")"):
            args.append(self._parse_assign_expr())
            if not self._accept(","):
                break
        self._expect(")")
        return args

    @staticmethod
    def _field_probe_type(t: str | None) -> str:
        """Normalize a base type to the MEMBER-key convention: strip
        struct/union/enum/const keywords and pointer/ref suffixes;
        reject templated/array/function types."""
        if not t:
            return ""
        t = t.strip()
        changed = True
        while changed:
            changed = False
            for kw in ("struct ", "union ", "enum ", "const "):
                if t.startswith(kw):
                    t = t[len(kw):].strip()
                    changed = True
        t = t.rstrip("*& ").strip()
        if not t or any(ch in t for ch in "<[;() "):
            return ""
        return t

    def _member_call_fqn(self, node: PNode, fname: str) -> str:
        """Qualified name for `base.m(...)` — overridable per dialect
        (the Go frontend qualifies package selectors)."""
        recv_type = ""
        if node.code == "this" and self.class_name_stack:
            recv_type = self.class_name_stack[-1]
        elif node.type_full_name and not any(
            ch in node.type_full_name for ch in "*&<[;"
        ):
            recv_type = node.type_full_name
        return f"{recv_type}.{fname}" if recv_type else fname

    def _make_field_access(self, node: PNode, fname_tok: Tok, op: str, start: int) -> PNode:
        """`base.f` (no call parens) -> fieldAccess CALL; overridable per
        dialect (Ruby lowers paren-less member METHOD calls here)."""
        fid = self._new(
            "FIELD_IDENTIFIER",
            fname_tok,
            name=fname_tok.text,
            code=fname_tok.text,
        )
        if (
            node.code == "this"
            and self.class_members_stack
            and fname_tok.text in self.class_members_stack[-1]
        ):
            fid.ref_target = self.class_members_stack[-1][fname_tok.text]
        opname = OPERATORS[op]
        call = self._new(
            "CALL",
            fname_tok,
            name=opname,
            method_full_name=opname,
            dispatch_type=STATIC_DISPATCH,
            code=self._slice(start),
            line=node.line,
            col=node.col,
        )
        # cross-fragment FieldAccessLinkerPass handle: when
        # the base's type is known but the member is NOT
        # declared in this fragment, record the two-key
        # (base type, field) probe as `Type.field` on the
        # fieldAccess call's full_name — the link stage
        # joins it against MEMBER full_names (reference
        # `typerelations/FieldAccessLinkerPass.scala:18-89`)
        if fid.ref_target is None:
            probe_t = self._field_probe_type(node.type_full_name)
            if probe_t:
                call.full_name = f"{probe_t}.{fname_tok.text}"
        call.add(node, fid)
        call.argument_children = [node, fid]
        return call

    def _parse_postfix(self) -> PNode:
        start = self.i
        node = self._parse_primary()
        while True:
            t = self._tok()
            txt = t.text
            if txt == "(" and node.label in ("IDENTIFIER", "METHOD_REF"):
                # direct call f(...)
                name = node.name or node.code
                args = self._parse_call_args()
                call = self._new(
                    "CALL",
                    t,
                    name=name,
                    method_full_name=name,
                    dispatch_type=STATIC_DISPATCH,
                    code=self._slice(start),
                    line=node.line,
                    col=node.col,
                )
                for a in args:
                    call.add(a)
                call.argument_children = args
                node = call
            elif txt == "(":
                # call on an arbitrary expression (e.g. (fp)(x)) — indirect
                args = self._parse_call_args()
                call = self._new(
                    "CALL",
                    t,
                    name="<operator>.pointerCall",
                    method_full_name="<operator>.pointerCall",
                    dispatch_type=DYNAMIC_DISPATCH,
                    code=self._slice(start),
                    line=node.line,
                    col=node.col,
                )
                call.add(node)
                for a in args:
                    call.add(a)
                call.argument_children = args
                call.receiver_child = node
                node = call
            elif txt in (".", "->") and self._tok(1).kind == "id":
                op = txt
                fname_tok = self._tok(1)
                self.i += 2
                if self._at("("):
                    # method call base.m(...) — when the receiver's type
                    # is known (typed local/param, or `this` inside a
                    # class) the call carries the QUALIFIED name T.m so
                    # linking and SAFEDISPATCH candidates work
                    mfn = self._member_call_fqn(node, fname_tok.text)
                    args = self._parse_call_args()
                    call = self._new(
                        "CALL",
                        fname_tok,
                        name=fname_tok.text,
                        method_full_name=mfn,
                        dispatch_type=DYNAMIC_DISPATCH,
                        code=self._slice(start),
                    )
                    node.argument_index = 0
                    call.add(node)
                    for a in args:
                        call.add(a)
                    call.argument_children = args
                    call.receiver_child = node
                    node = call
                else:
                    node = self._make_field_access(node, fname_tok, op, start)
            elif txt == "[":
                self.i += 1
                idx = self._parse_expr()
                self._expect("]")
                call = self._new(
                    "CALL",
                    t,
                    name=OPERATORS["[]"],
                    method_full_name=OPERATORS["[]"],
                    dispatch_type=STATIC_DISPATCH,
                    code=self._slice(start),
                    line=node.line,
                    col=node.col,
                )
                call.add(node, idx)
                call.argument_children = [node, idx]
                node = call
            elif txt in ("++", "--"):
                self.i += 1
                key = f"{txt}post"
                call = self._new(
                    "CALL",
                    t,
                    name=OPERATORS[key],
                    method_full_name=OPERATORS[key],
                    dispatch_type=STATIC_DISPATCH,
                    code=self._slice(start),
                )
                call.add(node)
                call.argument_children = [node]
                node = call
            else:
                return node

    def _parse_primary(self) -> PNode:
        t = self._tok()
        txt = t.text
        if t.kind == "num":
            self.i += 1
            is_float = any(c in txt for c in ".eE") and not txt.startswith("0x")
            return self._new(
                "LITERAL",
                t,
                code=txt,
                name="",
                type_full_name="double" if is_float else "int",
            )
        if t.kind == "str":
            self.i += 1
            typ = "char" if txt.startswith("'") and len(txt) <= 4 else "char*"
            if self.is_java or self.is_js:
                typ = "String"
            return self._new("LITERAL", t, code=txt, type_full_name=typ)
        if txt == "(":
            self.i += 1
            e = self._parse_expr()
            self._expect(")")
            return e
        if self.is_js and txt == "function":
            m = self._parse_js_function_expr()
            return m
        if self.is_js and txt == "{":
            # object literal — skip contents, emit LITERAL
            o0 = self.i
            self._skip_balanced("{", "}")
            return self._new(
                "LITERAL",
                t,
                code=self.src[self.toks[o0].start : self.toks[self.i - 1].end][
                    :MAX_CODE_LEN
                ],
                type_full_name="object",
            )
        if self.is_js and txt == "[":
            a0 = self.i
            self._skip_balanced("[", "]")
            return self._new(
                "LITERAL",
                t,
                code=self.src[self.toks[a0].start : self.toks[self.i - 1].end][
                    :MAX_CODE_LEN
                ],
                type_full_name="array",
            )
        if t.kind == "id":
            self.i += 1
            if txt in ("true", "false"):
                return self._new("LITERAL", t, code=txt, type_full_name="boolean")
            if txt in ("null", "NULL", "nullptr", "undefined"):
                return self._new("LITERAL", t, code=txt, type_full_name="null")
            ident = self._new("IDENTIFIER", t, name=txt, code=txt)
            target = self._lookup(txt)
            if target is None and self.class_members_stack:
                target = self.class_members_stack[-1].get(txt)
            if target is not None:
                ident.ref_target = target
                if target.type_full_name:
                    ident.type_full_name = target.type_full_name
            return ident
        raise ParseError(f"primary at {t!r}")

    def _parse_js_function_expr(self) -> PNode:
        """anonymous `function (…) {…}` in expression position — lift METHOD,
        return METHOD_REF (Joern jssrc creates METHOD + METHOD_REF)."""
        ft = self._expect("function")
        name = f"<lambda>{self.lambda_counter}"
        if self._tok().kind == "id":  # named function expression
            name = self._tok().text
            self.i += 1
        else:
            self.lambda_counter += 1
        full = f"{name}@{FRAG_PLACEHOLDER}"
        self.scopes.append({})
        params = self._parse_params()
        m = self._make_method_shell(
            name, full, f"ANY({','.join('ANY' for _ in params)})", params, "ANY", ft
        )
        self.lambda_stack.append([])
        body = self._parse_block()
        self._finish_method(m, body, "ANY")
        self.lambda_stack.pop()
        self.scopes.pop()
        if self.lambda_stack:
            self.lambda_stack[-1].append(m)
        return self._new(
            "METHOD_REF", ft, code=name, method_full_name=full, type_full_name=full
        )
