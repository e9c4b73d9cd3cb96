"""t0: parser golden assertions, modeled on the reference's per-operator
tests (`c2cpg/.../passes/ast/CallTests.scala:16-58` asserts code/name/
order/methodFullName/argumentIndex/line/column on CALL nodes)."""

from joern_ray.parsing.astmodel import flatten
from joern_ray.parsing.parser import FragmentParser

F1 = """int add(int x, int y) { return x + y; }
int main(int argc, char **argv) { printf("%d\\n", add((1+2), 3)); }
"""


def parse_rows(src, dialect="c", url="u", idx=0):
    root = FragmentParser(dialect).parse(src, url, idx)
    return flatten(root, url, idx, dialect)


def _by(nodes, **kw):
    return [n for n in nodes if all(n[k] == v for k, v in kw.items())]


def test_f1_call_fields():
    nodes, edges = parse_rows(F1)
    methods = _by(nodes, label="METHOD")
    assert {m["name"] for m in methods} == {"add", "main"}
    add_m = _by(nodes, label="METHOD", name="add")[0]
    assert add_m["full_name"] == "add"
    assert add_m["signature"] == "int(int,int)"
    assert add_m["line"] == 1

    add_call = _by(nodes, label="CALL", name="add")[0]
    assert add_call["method_full_name"] == "add"
    assert add_call["code"] == "add((1+2), 3)"
    assert add_call["line"] == 2
    assert add_call["dispatch_type"] == "STATIC_DISPATCH"

    # arguments: (1+2) addition call at index 1, literal 3 at index 2
    args = {e["obj"] for e in edges if e["pred"] == "ARGUMENT" and e["subj"] == add_call["id"]}
    arg_nodes = [n for n in nodes if n["id"] in args]
    assert sorted((n["name"] or n["code"], n["argument_index"]) for n in arg_nodes) == [
        ("3", 2),
        ("<operator>.addition", 1),
    ]


def test_f1_ast_edges_and_order():
    nodes, edges = parse_rows(F1)
    add_m = _by(nodes, label="METHOD", name="add")[0]
    kids = [e["obj"] for e in edges if e["pred"] == "AST" and e["subj"] == add_m["id"]]
    kid_nodes = sorted((n["order"], n["label"]) for n in nodes if n["id"] in kids)
    # params 1,2 then block then method_return, then parameter-out twins
    # (MethodDecorator analog)
    assert kid_nodes == [
        (1, "METHOD_PARAMETER_IN"),
        (2, "METHOD_PARAMETER_IN"),
        (3, "BLOCK"),
        (4, "METHOD_RETURN"),
        (5, "METHOD_PARAMETER_OUT"),
        (6, "METHOD_PARAMETER_OUT"),
    ]


def test_parameter_link_edges():
    nodes, edges = parse_rows(F1)
    byid = {n["id"]: n for n in nodes}
    links = [
        (byid[e["subj"]]["label"], byid[e["obj"]]["label"])
        for e in edges
        if e["pred"] == "PARAMETER_LINK"
    ]
    assert links and all(l == ("METHOD_PARAMETER_IN", "METHOD_PARAMETER_OUT") for l in links)


def test_binds_edges_java():
    src = "public class A { public int f() { return 1; } }"
    nodes, edges = parse_rows(src, "java")
    byid = {n["id"]: n for n in nodes}
    binds = [
        (byid[e["subj"]]["name"], byid[e["obj"]]["name"])
        for e in edges
        if e["pred"] == "BINDS"
    ]
    assert ("A", "f") in binds


def test_operator_vocabulary():
    nodes, _ = parse_rows("int f() { int a = 1; a += 2; a++; return a ? 1 : -a; }")
    ops = {n["name"] for n in nodes if n["label"] == "CALL"}
    assert {
        "<operator>.assignment",
        "<operator>.assignmentPlus",
        "<operator>.postIncrement",
        "<operator>.conditional",
        "<operator>.minus",
    } <= ops


def test_ref_edges_to_locals_and_params():
    nodes, edges = parse_rows("int f(int p) { int a = p; return a; }")
    ref_pairs = set()
    byid = {n["id"]: n for n in nodes}
    for e in edges:
        if e["pred"] == "REF":
            ref_pairs.add((byid[e["subj"]]["name"], byid[e["obj"]]["label"]))
    assert ("p", "METHOD_PARAMETER_IN") in ref_pairs
    assert ("a", "LOCAL") in ref_pairs


def test_f6_java_class():
    src = """public class Widget {
      private int count;
      public Widget(int c) { this.count = c; }
      public int getCount() { return count; }
      public int callsExternalMethod(int x) { int y = externalLib(x + 1); return y * count; }
    }"""
    nodes, edges = parse_rows(src, "java")
    td = _by(nodes, label="TYPE_DECL", name="Widget")[0]
    methods = _by(nodes, label="METHOD")
    assert {m["name"] for m in methods} == {"Widget", "getCount", "callsExternalMethod"}
    assert all(m["full_name"].startswith("Widget.") or m["full_name"] == "Widget" for m in methods)
    assert _by(nodes, label="MEMBER", name="count")
    ext = _by(nodes, label="CALL", name="externalLib")[0]
    assert ext["method_full_name"] == "externalLib"


def test_f5_js_functions():
    src = """function lookForProperty(obj) {
      var found = obj.prop1;
      if (found) { return found; }
      return null;
    }
    var handler = function (x) { return lookForProperty(x); };
    """
    nodes, _ = parse_rows(src, "javascript")
    methods = _by(nodes, label="METHOD")
    names = {m["name"] for m in methods}
    assert ":program" in names and "lookForProperty" in names
    assert len(methods) >= 3  # testDistro.py minimum for jssrc
    fa = _by(nodes, label="CALL", name="<operator>.fieldAccess")
    assert fa and fa[0]["code"] == "obj.prop1"


def test_garbage_becomes_unknown_not_crash():
    nodes, _ = parse_rows("@@@ ]]] )))) while if +++", "c")
    assert any(n["label"] == "UNKNOWN" for n in nodes)


def test_cpp_new_delete():
    nodes, _ = parse_rows("int *f(int n) { int *p = new int(n); delete p; return 0; }", "cpp")
    ops = {n["name"] for n in nodes if n["label"] == "CALL"}
    assert "<operator>.alloc" in ops and "<operator>.delete" in ops


def test_determinism_and_id_stability():
    a = parse_rows(F1)
    b = parse_rows(F1)
    assert a == b
    c = parse_rows(F1, url="other")
    ids_a = {n["id"] for n in a[0]}
    ids_c = {n["id"] for n in c[0]}
    assert not (ids_a & ids_c)  # ids depend on url


def test_typedef_alias():
    src = "typedef unsigned long my_size_t;\ntypedef struct { int a; } Point;\n"
    nodes, _ = parse_rows(src, "c")
    tds = {n["name"]: n["signature"] for n in nodes if n["label"] == "TYPE_DECL"}
    assert tds["my_size_t"] == "alias:unsigned long"
    assert "Point" in tds


def test_import_nodes():
    cases = [
        ("c", '#include <stdio.h>\nint f(){return 0;}', {"stdio.h"}),
        ("java", "import java.util.List;\npublic class A { }", {"java.util.List"}),
        ("javascript", "const x = require('lodash');\nfunction f(){}", {"lodash"}),
    ]
    for dialect, src, want in cases:
        nodes, edges = parse_rows(src, dialect)
        imps = {n["name"] for n in nodes if n["label"] == "IMPORT"}
        assert imps == want
        byid = {n["id"]: n for n in nodes}
        assert any(
            e["pred"] == "IMPORTS" and byid[e["subj"]]["label"] == "NAMESPACE_BLOCK"
            for e in edges
        )


def test_macro_definitions_become_methods():
    """MacroHandler analog (`c2cpg/.../MacroHandler.scala:1-224`):
    function-like #defines lift to METHOD nodes named like the macro so
    invocations link; object-like defines are inventoried as UNKNOWN."""
    from joern_ray.parsing.astmodel import flatten
    from joern_ray.parsing.parser import FragmentParser

    src = (
        "#define MIN(a, b) ((a) < (b) ? (a) : (b))\n"
        "#define BUF_SIZE 64\n"
        "int clamp(int x) {\n"
        "  return MIN(x, 10);\n"
        "}\n"
    )
    root = FragmentParser("c").parse(src, "u", 0)
    nodes, _edges = flatten(root, "u", 0, "c")
    macros = [n for n in nodes if n["label"] == "METHOD" and n["name"] == "MIN"]
    assert len(macros) == 1
    assert macros[0]["full_name"] == "MIN"
    assert macros[0]["signature"] == "ANY(ANY,ANY)"
    assert macros[0]["code"].startswith("#define MIN")
    unk = [n for n in nodes if n["label"] == "UNKNOWN" and n["name"] == "BUF_SIZE"]
    assert len(unk) == 1
    # the invocation parses as an ordinary call with the macro's fqn
    calls = [n for n in nodes if n["label"] == "CALL" and n["method_full_name"] == "MIN"]
    assert len(calls) == 1


def test_preprocessor_ifdef_listing():
    """PreprocessorPass #ifdef half (reference `c2cpg/.../passes/
    PreprocessorPass.scala:14-39`): every #if/#ifdef/#ifndef/#elif is
    listed as an UNKNOWN directive node named by its guard symbol."""
    from joern_ray.parsing.astmodel import flatten
    from joern_ray.parsing.parser import FragmentParser

    src = (
        "#ifdef DEBUG\n"
        "#define LOG(x) print_log(x)\n"
        "#endif\n"
        "#ifndef MAX\n"
        "#define MAX 10\n"
        "#endif\n"
        "#if defined(FEATURE_X)\n"
        "int with_feature(void) { return 1; }\n"
        "#elif FEATURE_Y > 2\n"
        "int other(void) { return 2; }\n"
        "#endif\n"
    )
    root = FragmentParser("c").parse(src, "u", 0)
    nodes, _e = flatten(root, "u", 0, "c")
    directives = {
        n["name"]: n["code"] for n in nodes if n["label"] == "UNKNOWN"
    }
    assert {"DEBUG", "MAX", "FEATURE_X", "FEATURE_Y"} <= set(directives)
    assert directives["DEBUG"].startswith("#ifdef")
    assert directives["FEATURE_X"].startswith("#if defined")
