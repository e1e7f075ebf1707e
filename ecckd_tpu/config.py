"""Configuration language compatible with ecCKD's ``readconfig``.

Implements the config syntax of the reference (documented in
doc/ecckd_documentation.tex:672-737; C implementation
src/tools/readconfig.c, API src/include/readconfig.h:23-204):

* whitespace-separated ``param value`` lines, ``#`` comments
* quoted multi-token string values (may span lines)
* ``\\begin section ... \\end section`` scoping, flattened to ``section.param``
* command-line ``key=value`` overrides plus bare config-file arguments
* values read as scalars, vectors, strings, or space-separated string lists
  with indexed access (``cfg.read_string("gases", i)`` iterates a list)
* whole-config serialization for provenance embedding in outputs

This is a typed Python re-design, not a port of the C parser.
"""

from __future__ import annotations

import re
import shlex
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union


class ConfigError(ValueError):
    pass


def _strip_comment(line: str) -> str:
    """Remove a ``#`` comment, respecting double quotes."""
    out = []
    in_quote = False
    for c in line:
        if c == '"':
            in_quote = not in_quote
        if c == "#" and not in_quote:
            break
        out.append(c)
    return "".join(out)


def _parse(text: str) -> Dict[str, str]:
    """Parse config text into a flat ``{key: raw_value}`` dict.

    A parameter's value runs from after its name to the end of the line, with
    surrounding double quotes removed; a quoted value may span lines (used for
    multi-file lists).  Keys inside ``\\begin sec ... \\end sec`` become
    ``sec.key``.
    """
    out: Dict[str, str] = {}
    section = ""
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = _strip_comment(lines[i])
        i += 1
        stripped = line.strip()
        if not stripped:
            continue
        # An open quote means the value continues onto subsequent lines
        while stripped.count('"') % 2 == 1:
            if i >= len(lines):
                raise ConfigError("Unterminated quoted string in config")
            stripped += "\n" + _strip_comment(lines[i]).strip()
            i += 1
        parts = stripped.split(None, 1)
        key = parts[0]
        if key in ("\\begin", "\\begin{"):
            if len(parts) < 2:
                raise ConfigError("\\begin without section name")
            section = parts[1].strip()
            continue
        if key == "\\end":
            section = ""
            continue
        value = parts[1].strip() if len(parts) > 1 else ""
        if value.startswith('"') and value.endswith('"') and len(value) >= 2:
            value = value[1:-1]
        # Collapse internal newlines/whitespace in multi-line quoted values
        value = " ".join(value.split())
        full_key = f"{section}.{key}" if section else key
        out[full_key] = value
    return out


class Config:
    """Flat key→string config store with typed readers and CLI overrides.

    Mirrors the reference ``DataFile``-backed Cfg engine interface used by all
    pipeline executables (ref: src/tools/DataFile.cpp:117-125): construct from
    ``argv`` to combine a config file with ``key=value`` overrides, or from a
    file/text/dict directly.
    """

    def __init__(self, data: Optional[Dict[str, str]] = None):
        self._data: Dict[str, str] = dict(data or {})
        self._source_files: List[str] = []

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------
    @classmethod
    def from_text(cls, text: str) -> "Config":
        return cls(_parse(text))

    @classmethod
    def from_file(cls, path: str) -> "Config":
        """Extension-dispatched load (ref DataFile format dispatch,
        src/tools/DataFile.cpp:76-110: cfg→Cfg engine, xml→Xml engine)."""
        if path.endswith(".xml"):
            return cls.from_xml(path)
        with open(path) as f:
            cfg = cls(_parse(f.read()))
        cfg._source_files.append(path)
        return cfg

    @classmethod
    def from_xml(cls, path: str) -> "Config":
        """Read a config from an XML document: element nesting maps to the
        dotted-section namespace, element text (whitespace-separated) to
        values, exactly as ``\\begin sec … \\end sec`` does in the cfg
        language.

        The reference's XML engine (src/tools/DataFileEngineXml.cpp) is only
        built against the proprietary GMV ECSL library (#ifdef HAVE_GMVECSL)
        and is absent from default builds; this standalone reader keeps the
        same DataFile-facade semantics without that dependency, including
        the GMV dialect's name mapping (DataFileEngineXml.cpp:82-113
        ``translate_varname``): unsectioned names live in a top-level
        ``<main>`` group (``read("x")`` finds ``<main><x>``), dotted names
        map to element nesting (``a.b`` -> ``<a><b>``), and element tags may
        themselves contain dots (``a.b.c.d`` -> ``<a><b><c.d>``).
        """
        import xml.etree.ElementTree as ET

        root = ET.parse(path).getroot()
        data: Dict[str, str] = {}

        def walk(elem, prefix):
            children = list(elem)
            text = (elem.text or "").strip()
            if text:
                data[prefix] = " ".join(text.split())
            for child in children:
                walk(child, f"{prefix}.{child.tag}" if prefix
                     else child.tag)

        for child in root:
            if child.tag == "main":
                # GMV scope rule: <main> holds the unsectioned namespace.
                for sub in child:
                    walk(sub, sub.tag)
            else:
                walk(child, child.tag)
        cfg = cls(data)
        cfg._source_files.append(path)
        return cfg

    @classmethod
    def from_args(cls, args: Sequence[str]) -> "Config":
        """Build config from CLI args: ``key=value`` overrides + config files.

        Bare arguments are treated as config-file names (readconfig.h:56-70).
        Later files/overrides take precedence; overrides always beat files.
        """
        cfg = cls()
        overrides: Dict[str, str] = {}
        for arg in args:
            if "=" in arg and not arg.startswith("="):
                key, _, value = arg.partition("=")
                overrides[key] = value
            else:
                sub = cls.from_file(arg)
                cfg._data.update(sub._data)
                cfg._source_files.extend(sub._source_files)
        cfg._data.update(overrides)
        return cfg

    # ------------------------------------------------------------------
    # Typed readers.  All return (value, True) style via default sentinel:
    # read(key) raises if missing unless a default is given.
    # ------------------------------------------------------------------
    _MISSING = object()

    def exist(self, key: str) -> bool:
        return key in self._data

    def _raw(self, key: str, default: Any = _MISSING) -> Optional[str]:
        if key in self._data:
            return self._data[key]
        if default is self._MISSING:
            raise ConfigError(f"Config key {key!r} not found")
        return default

    def read_string(self, key: str, index: Optional[int] = None,
                    default: Any = _MISSING) -> Optional[str]:
        """Read a string; with ``index``, the i'th space-separated token.

        Returns None when index is past the end of the list (this is how the
        reference iterates lists of unknown length, e.g. ``gases``,
        ``training_input``).
        """
        raw = self._raw(key, default)
        if raw is None:
            return None
        if index is None:
            return raw
        toks = raw.split()
        if index < 0 or index >= len(toks):
            return None
        return toks[index]

    def read_strings(self, key: str, default: Any = _MISSING) -> Optional[List[str]]:
        raw = self._raw(key, default)
        if raw is None:
            return None
        return raw.split()

    def read_float(self, key: str, default: Any = _MISSING,
                   index: Optional[int] = None) -> Optional[float]:
        """Read a number; with ``index``, the i'th element of a
        space-separated list (ref ``DataFile::read(Real&, varname, j)``,
        src/include/DataFile.h; returns None past the end)."""
        raw = self._raw(key, default)
        if raw is None or isinstance(raw, (int, float)):
            return raw
        toks = raw.split()
        if index is not None:
            if index < 0 or index >= len(toks):
                return None
            toks = toks[index:]
        try:
            return float(toks[0])
        except (ValueError, IndexError):
            raise ConfigError(f"Config key {key!r} is not a number: {raw!r}")

    def read_int(self, key: str, default: Any = _MISSING,
                 index: Optional[int] = None) -> Optional[int]:
        raw = self._raw(key, default)
        if raw is None or isinstance(raw, int):
            return raw
        toks = raw.split()
        if index is not None:
            if index < 0 or index >= len(toks):
                return None
            toks = toks[index:]
        try:
            return int(float(toks[0]))
        except (ValueError, IndexError):
            raise ConfigError(f"Config key {key!r} is not an integer: {raw!r}")

    def read_bool(self, key: str, default: Any = _MISSING) -> Optional[bool]:
        raw = self._raw(key, default)
        if raw is None or isinstance(raw, bool):
            return raw
        tok = str(raw).split()[0].lower()
        if tok in ("1", "true", "yes", "on"):
            return True
        if tok in ("0", "false", "no", "off"):
            return False
        raise ConfigError(f"Config key {key!r} is not a boolean: {raw!r}")

    def read_floats(self, key: str, default: Any = _MISSING) -> Optional[List[float]]:
        raw = self._raw(key, default)
        if raw is None or isinstance(raw, list):
            return raw
        return [float(t) for t in raw.split()]

    def read_ints(self, key: str, default: Any = _MISSING) -> Optional[List[int]]:
        raw = self._raw(key, default)
        if raw is None or isinstance(raw, list):
            return raw
        return [int(float(t)) for t in raw.split()]

    def set(self, key: str, value: Any) -> None:
        if isinstance(value, (list, tuple)):
            self._data[key] = " ".join(str(v) for v in value)
        else:
            self._data[key] = str(value)

    def section(self, name: str) -> "Config":
        """Sub-config of all ``name.*`` keys with the prefix stripped."""
        prefix = name + "."
        return Config({k[len(prefix):]: v for k, v in self._data.items()
                       if k.startswith(prefix)})

    def keys(self) -> List[str]:
        return list(self._data.keys())

    # ------------------------------------------------------------------
    # Provenance
    # ------------------------------------------------------------------
    def serialize(self) -> str:
        """Render the full config as text, for embedding in output files
        (mirrors rc_sprint, readconfig.h:75-77)."""
        lines = []
        for key in sorted(self._data):
            val = self._data[key]
            if re.search(r"\s", val):
                val = '"' + val + '"'
            lines.append(f"{key} {val}")
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"Config({len(self._data)} keys)"


def command_line_string(argv: Sequence[str]) -> str:
    """Reconstruct a command line for the provenance ``history`` attribute."""
    return " ".join(shlex.quote(a) if re.search(r"\s", a) else a for a in argv)
