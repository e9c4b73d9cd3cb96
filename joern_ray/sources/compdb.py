"""JSON compilation database (compile_commands.json) support.

Analog of the reference's `c2cpg/.../parser/JSONCompilationDatabaseParser
.scala:34-111` and its use in `AstCreationPass.scala:87-95,120-127,
153-170`: when a compilation database is configured, ONLY the files it
lists are parsed (C family), and each file's `-D` defines / `-I`
includes from its compile command are fed to the parser.

Webtext mapping: a "file" in the database matches a document by URL
basename (fragments have no filesystem path).  Defines are prepended as
`#define NAME VALUE` lines to the fragment source before parsing — the
shared MacroHandler then lifts function-like defines into METHOD nodes
and object-like defines into the PreprocessorPass inventory, exactly
the channel CdtParser feeds its ScannerInfo through.

Everything here is driver-/actor-local and tiny (a compile_commands
.json is KBs); the per-fragment application is a vectorized
`map_batches` stage (`apply_compdb_batch`).
"""

from __future__ import annotations

import json
import posixpath
import re
from dataclasses import dataclass, field

# reference `JSONCompilationDatabaseParser.scala:25` (defineInCommandPattern)
_DEFINE_RE = re.compile(r"-D([A-Za-z_][A-Za-z0-9_]+)(?:=(\\*\".*\"|\S*))?")
# reference `JSONCompilationDatabaseParser.scala:32` (includeInCommandPattern)
_INCLUDE_RE = re.compile(r"-I(\S+)")

_C_FAMILY = ("c", "cpp")


@dataclass
class CommandObject:
    """One entry of the database (reference `CommandObject`,
    JSONCompilationDatabaseParser.scala:69-110)."""

    directory: str
    file: str
    arguments: list[str] = field(default_factory=list)
    command: list[str] = field(default_factory=list)

    def compiled_file(self) -> str:
        """Absolute path of the compiled file (reference
        `compiledFile()`: relative paths resolve against `directory`)."""
        if posixpath.isabs(self.file):
            return posixpath.normpath(self.file)
        return posixpath.normpath(posixpath.join(self.directory, self.file))

    def defines(self) -> list[tuple[str, str]]:
        """(name, value) pairs from `-D` flags in arguments + command."""
        out: list[tuple[str, str]] = []
        for a in self.arguments:
            if a.startswith("-D"):
                s = a[2:]
                name, _, val = s.partition("=")
                if name:
                    out.append((name, val))
        for c in self.command:
            for m in _DEFINE_RE.finditer(c):
                out.append((m.group(1), m.group(2) or ""))
        return out

    def includes(self) -> list[str]:
        """Paths from `-I` flags in arguments + command."""
        out = [a[2:] for a in self.arguments if a.startswith("-I")]
        for c in self.command:
            out.extend(m.group(1) for m in _INCLUDE_RE.finditer(c))
        return out


def parse_compilation_database(text: str) -> "list[CommandObject] | None":
    """Parse compile_commands.json content -> command objects, or None
    on malformed input (reference logs-and-returns-None contract,
    JSONCompilationDatabaseParser.scala:36-49)."""
    try:
        arr = json.loads(text)
        if not isinstance(arr, list):
            return None
        out: list[CommandObject] = []
        seen: set[tuple] = set()
        for obj in arr:
            co = CommandObject(
                directory=str(obj.get("directory", "")),
                file=str(obj["file"]),
                arguments=[str(a) for a in obj.get("arguments", []) or []],
                command=[str(obj["command"])] if "command" in obj else [],
            )
            key = (co.directory, co.file, tuple(co.arguments), tuple(co.command))
            if key not in seen:  # LinkedHashSet dedup semantics
                seen.add(key)
                out.append(co)
        return out
    except (ValueError, KeyError, TypeError):
        return None


def _basename_index(db: "list[CommandObject]") -> dict[str, CommandObject]:
    """URL-basename -> command object (first wins, LinkedHashSet order)."""
    idx: dict[str, CommandObject] = {}
    for co in db:
        base = posixpath.basename(co.compiled_file())
        idx.setdefault(base, co)
    return idx


def define_prelude(co: CommandObject) -> str:
    """`#define N V` lines for the fragment source prelude."""
    lines = []
    for name, val in co.defines():
        lines.append(f"#define {name} {val}".rstrip())
    return ("\n".join(lines) + "\n") if lines else ""


def apply_compdb_batch(batch, db: "list[CommandObject]"):
    """FRAGMENTS_SCHEMA batch transform: C-family fragments are kept
    only when their URL basename matches a compiled file, and gain that
    file's define prelude (content_hash recomputed); other languages
    pass through untouched (the database governs the C frontend only,
    reference AstCreationPass.scala:120-127)."""
    import pyarrow as pa

    from ..stages.extract import hash64_bytes

    idx = _basename_index(db)
    langs = batch.column("frag_lang").to_pylist()
    urls = batch.column("url").to_pylist()
    codes = batch.column("code").to_pylist()
    hashes = batch.column("content_hash").to_pylist()
    keep = []
    for i, lang in enumerate(langs):
        if lang not in _C_FAMILY:
            keep.append(i)
            continue
        co = idx.get(posixpath.basename(urls[i].split("?", 1)[0].rstrip("/")))
        if co is None:
            continue  # not in the database -> not parsed
        keep.append(i)
        prelude = define_prelude(co)
        if prelude:
            codes[i] = prelude + codes[i]
            hashes[i] = hash64_bytes(codes[i].encode())
    if len(keep) == len(langs) and all(
        h == hashes[i] for i, h in enumerate(batch.column("content_hash").to_pylist())
    ):
        return batch
    t = batch.set_column(
        batch.schema.get_field_index("code"), "code", pa.array(codes, batch.schema.field("code").type)
    )
    t = t.set_column(
        t.schema.get_field_index("content_hash"),
        "content_hash",
        pa.array(hashes, batch.schema.field("content_hash").type),
    )
    return t.take(pa.array(keep, pa.int64()))
