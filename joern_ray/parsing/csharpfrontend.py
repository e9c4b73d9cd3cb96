"""C# fragment frontend — csharpsrc2cpg analog on the shared machinery.

The reference ships a C# frontend (`joern-cli/frontends/csharpsrc2cpg`,
`AstCreator` over the Roslyn JSON dump); this re-expresses its output
shape on the shared PNode IR.  C# is Java-shaped (braces, typed members,
`new C()` allocation), so the frontend rides the JAVA dialect of
`FragmentParser` and adds only the C#-specific layer:

- `using System.IO;` -> IMPORT (directive form only; `using (...)`
  statements fall through to the statement parser)
- `namespace N { ... }` / file-scoped `namespace N;` -> the fragment's
  NAMESPACE_BLOCK is named N (csharpsrc2cpg's NamespaceDeclaration)
- `[Attribute]` lists are skipped at declaration sites
- `class C : Base, IFace` -> TYPE_DECL with the ;-joined inherits list
  (C# uses `:` where Java has extends/implements)
- auto-properties `public int X { get; set; }` -> MEMBER (the
  reference lowers properties to member + accessor methods; the member
  carries the FieldAccessLinkerPass join handle)
- C#-only modifiers (virtual/override/sealed/internal/async/...) are
  skipped before delegating to the shared Java member parser
- `var x = new C();` types the local from the allocation so `x.M()`
  dispatches as C.M (SAFEDISPATCH pathway)
- `Console.WriteLine(..)` — an Uppercase unresolved receiver is a
  type-qualified static call (`Console.WriteLine`), the same pathway
  the import resolver and naive linker consume
"""

from __future__ import annotations

from .astmodel import FRAG_PLACEHOLDER, PNode
from .parser import FragmentParser, ParseError

_CS_MODIFIERS = frozenset(
    "public private protected internal static readonly sealed virtual "
    "override abstract async partial extern unsafe new const volatile "
    "required".split()
)

_CS_CLASS_KW = ("class", "interface", "struct", "enum", "record")


class CSharpFragmentParser(FragmentParser):
    """`parse(src, url, idx)` surface identical to the other frontends;
    one instance per actor, reused across fragments."""

    def __init__(self) -> None:
        super().__init__("java")
        self.dialect = "csharp"
        # C# lowercase primitive aliases the Java keyword set lacks
        self.type_keywords = frozenset(self.type_keywords) | frozenset(
            "string object bool decimal uint ulong sbyte ushort dynamic".split()
        )

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
        if not self.toks or self._at_eof():
            raise ParseError("empty csharp fragment")
        n_meaningful = 0
        while not self._at_eof():
            start = self.i
            try:
                t = self._tok()
                txt = t.text
                if txt == "using" and self._tok(1).kind == "id" and not self._at("(", 1):
                    imp = self._cs_using()
                    if imp is not None:
                        root.add(imp)
                        root.extra_edges.append(("IMPORTS", imp))
                        n_meaningful += 1
                    continue
                if txt == "namespace" and self._tok(1).kind == "id":
                    self.i += 1
                    ns = self._parse_qualified_name()
                    root.name = ns
                    root.full_name = f"{FRAG_PLACEHOLDER}:{ns}"
                    root.code = f"namespace {ns}"
                    # file-scoped `namespace N;` or block `namespace N {`
                    if not self._accept(";"):
                        self._accept("{")
                    continue
                if txt == "[":
                    self._skip_balanced("[", "]")
                    continue
                if txt == "}":  # namespace block close
                    self.i += 1
                    continue
                j = 0
                while self._tok(j).kind == "id" and self._tok(j).text in _CS_MODIFIERS:
                    j += 1
                if self._tok(j).text in _CS_CLASS_KW and self._tok(j + 1).kind == "id":
                    self.i += j
                    root.add(self._cs_class())
                    n_meaningful += 1
                    continue
                # top-level statements (C# 9 program style) / members
                for s in self._parse_stmt_safe():
                    root.add(s)
                    self._cs_var_assign(s)
                    n_meaningful += 1
            except ParseError:
                self._sync(start, root)
            if self.i == start:
                self.i += 1
        if n_meaningful == 0:
            raise ParseError("no csharp declarations found")
        return root

    # ---- declarations ------------------------------------------------------

    def _cs_using(self) -> "PNode | None":
        t = self._expect("using")
        if self._tok().text == "static":
            self.i += 1
        name = self._parse_qualified_name()
        if self._at("="):  # using alias: `using IO = System.IO;`
            self.i += 1
            name = self._parse_qualified_name()
        self._accept(";")
        if not name:
            return None
        return self._new("IMPORT", t, name=name, code=f"using {name}")

    def _cs_class(self) -> PNode:
        kw = self._tok()
        self.i += 1
        name_tok = self._tok()
        name = name_tok.text if name_tok.kind == "id" else "<anonymous>"
        if name_tok.kind == "id":
            self.i += 1
        if self._at("<"):
            self._skip_balanced("<", ">")
        if self._at("("):  # record primary constructor — params become members
            self._skip_balanced("(", ")")
        inherits: list[str] = []
        if self._accept(":"):
            while self._tok().kind == "id":
                inherits.append(self._parse_qualified_name())
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
            type_full_name=";".join(inherits),
        )
        self.class_members_stack.append({})
        self.class_name_stack.append(name)
        self._expect("{")
        while not self._at_eof() and not self._at("}"):
            start = self.i
            try:
                if self._at("["):
                    self._skip_balanced("[", "]")
                    continue
                member = self._cs_member(name)
                if member is not None:
                    td.add(member)
                    if member.label == "METHOD":
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

    def _cs_member(self, class_name: str) -> "PNode | None":
        # skip C# modifiers the Java member parser doesn't know, then
        # peek: `Type Name {` is an auto-property -> MEMBER
        while self._tok().kind == "id" and self._tok().text in _CS_MODIFIERS:
            self.i += 1
        if self._tok().text in _CS_CLASS_KW and self._tok(1).kind == "id":
            self.i += 1 if False else 0  # nested type rides _cs_class
            return self._cs_class()
        start = self.i
        save = self.i
        typ = self._try_parse_type()
        if typ is not None and self._tok().kind == "id" and self._at("{", 1):
            # auto-property: `T Name { get; set; } [= default;]`
            nt = self._tok()
            self.i += 1
            mem = self._new(
                "MEMBER",
                nt,
                name=nt.text,
                full_name=f"{class_name}.{nt.text}",
                type_full_name=typ,
                code=self._slice(start, self.i),
            )
            self._skip_balanced("{", "}")
            if self._accept("="):
                self._parse_assign_expr()
            self._accept(";")
            return mem
        self.i = save
        return self._parse_java_member(class_name)

    # ---- typing hooks ------------------------------------------------------

    def _cs_var_assign(self, n: PNode) -> None:
        """`var x = new C()` — record C on the target local so `x.M()`
        dispatches as C.M (the Java path types explicit declarations;
        `var` infers from the allocation)."""
        if n.label != "CALL" or n.name != "<operator>.assignment":
            return
        args = n.argument_children
        if len(args) != 2 or args[0].label != "IDENTIFIER":
            return
        lhs, rhs = args
        if (
            rhs.label == "CALL"
            and rhs.name == "<operator>.alloc"
            and rhs.type_full_name
            and lhs.ref_target is not None
            and lhs.ref_target.label in ("LOCAL", "METHOD_PARAMETER_IN")
            and lhs.ref_target.type_full_name in ("", "var", None)
        ):
            lhs.ref_target.type_full_name = rhs.type_full_name
            lhs.type_full_name = rhs.type_full_name

    def _parse_stmt(self) -> list[PNode]:
        out = super()._parse_stmt()
        for n in out:
            self._cs_var_assign(n)
        return out

    def _member_call_fqn(self, node: PNode, fname: str) -> str:
        """`Console.WriteLine(x)` — an UNRESOLVED Uppercase receiver is a
        type-qualified static call (csharpsrc2cpg resolves type-name
        receivers the same way; the import resolver / naive linker
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
