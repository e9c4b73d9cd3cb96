"""t0: text extraction + fragment detection (byte-identical invariant)."""

import pyarrow as pa

from joern_ray.sources.corpus import docs_table
from joern_ray.stages.extract import (
    detect_fragments_batch,
    detect_fragments_in_html,
    extract_text,
)


def test_extract_text_byte_identical_per_url():
    t = docs_table(150)
    for h, x in zip(t.column("html").to_pylist(), t.column("text").to_pylist()):
        assert extract_text(h) == x


def test_extract_drops_script_style_comments():
    html = b"<p>a</p><script>x()</script><style>s{}</style><!-- c --><p>b</p>"
    assert extract_text(html) == "a\nb"


def test_pre_content_verbatim():
    html = b"<pre>  int  x;\n  y;</pre>"
    assert extract_text(html) == "int  x;\n  y;"


def test_entities_unescaped():
    assert extract_text(b"<p>a &amp;&lt; b</p>") == "a &< b"


def test_detect_fragments_offsets_and_lang():
    code = "int f() { return 1 &lt; 2; }"
    html = f'<p>x</p><pre><code class="language-c">{code}</code></pre>'.encode()
    frags, rejects = detect_fragments_in_html("u", html)
    assert len(frags) == 1 and not rejects
    f = frags[0]
    assert f["frag_lang"] == "c"
    assert f["code"] == "int f() { return 1 < 2; }"  # entity-unescaped
    assert html[f["byte_start"] : f["byte_end"]].decode() == code


def test_malformed_block_rejected_not_raised():
    frags, rejects = detect_fragments_in_html("u", b'<pre><code class="language-c">int x = ')
    assert frags == []
    assert rejects[0]["reason"] == "unclosed_code_block"


def test_detect_batch_union_rows():
    t = docs_table(80)
    out = detect_fragments_batch(t.select(["url", "html"]))
    kinds = set(out.column("row_kind").to_pylist())
    assert "fragment" in kinds
    assert out.num_rows > 0
    assert out.column("content_hash").type == pa.uint64()


def test_language_guess_majority_vote():
    """Bare <pre><code> blocks (no language class) get a language via
    content markers first, then the document's classified majority
    (reference `console/.../cpgcreation/package.scala:63-77` directory-
    majority analog)."""
    from joern_ray.stages.extract import detect_fragments_in_html, guess_language

    html = (
        b"<html><body>"
        b'<pre><code class="language-c">int a(void) { return 1; }</code></pre>'
        b'<pre><code class="language-c">int b(void) { return 2; }</code></pre>'
        b'<pre><code class="language-java">public class X { }</code></pre>'
        b"<pre><code>int mystery(void) { return 3; }</code></pre>"
        b"</body></html>"
    )
    frags, rejects = detect_fragments_in_html("https://g/1", html)
    assert not rejects
    langs = [f["frag_lang"] for f in frags]
    # three classified + one bare; the bare block has no content marker
    # hit for its snippet? it does match none of the obvious markers, so
    # the document majority (c) wins
    assert langs[:3] == ["c", "c", "java"]
    assert langs[3] == "c"
    # content markers beat the majority
    assert guess_language("def f(x):\n    return x\n", "c") == "python"
    assert guess_language("<?php echo $x; ?>", "c") == "php"
    assert guess_language("package main\nfunc F() {}\n", None) == "go"
    # nothing recognizable, no siblings -> unknown
    assert guess_language("just some prose", None) == "unknown"
