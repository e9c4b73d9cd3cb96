"""C-family tokenizer shared by the c/cpp/java/javascript fragment parsers.

The container has no tree-sitter, so parsing is pure Python.  The tokenizer
is a single compiled-regex scan (compiled once at import — per-process, the
moral equivalent of per-actor parser state, reference
`AstCreationPass.scala:92-93` one CdtParser per pass instance).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<pp>\#[^\n]*)
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<num>0[xX][0-9a-fA-F]+|(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?[fFlLuU]*)
  | (?P<id>[A-Za-z_$][A-Za-z_$0-9]*)
  | (?P<punct><<=|>>=|->|\+\+|--|<<|>>|<=|>=|==|!=|&&|\|\||\+=|-=|\*=|/=|%=|&=|\|=|\^=|=>|::|\.\.\.|[-+*/%<>=!&|^~?:;,.(){}\[\]@\\])
    """,
    re.S | re.X,
)


@dataclass
class Tok:
    kind: str  # id | num | str | punct | eof
    text: str
    start: int  # byte/char offset into the fragment source
    end: int
    line: int  # 1-based within the fragment
    col: int  # 1-based

    def __repr__(self) -> str:  # compact for test failures
        return f"{self.kind}:{self.text!r}@{self.line}:{self.col}"


EOF = "\x00eof"


def tokenize(src: str) -> list[Tok]:
    """Lossy-tolerant scan: comments/whitespace/preprocessor lines dropped,
    unknown characters skipped (never raises)."""
    toks: list[Tok] = []
    line, col, pos = 1, 1, 0
    n = len(src)
    while pos < n:
        m = TOKEN_RE.match(src, pos)
        if m is None:
            # unknown char: skip it, keep position bookkeeping
            if src[pos] == "\n":
                line += 1
                col = 1
            else:
                col += 1
            pos += 1
            continue
        text = m.group(0)
        kind = m.lastgroup or "ws"
        if kind not in ("ws", "comment", "pp"):
            toks.append(Tok(kind, text, m.start(), m.end(), line, col))
        nl = text.count("\n")
        if nl:
            line += nl
            col = len(text) - text.rfind("\n")
        else:
            col += len(text)
        pos = m.end()
    toks.append(Tok("eof", EOF, n, n, line, col))
    return toks
