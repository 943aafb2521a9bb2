"""Routing: index-pattern templates, dotted-path lookup, route sanitization.

Behavior parity with the reference (new code, no port):
- template parse/eval (``{{dotted.path}}`` parts + literals):
  ``/root/reference/src/type_map.rs:9-62``; golden case
  ``{{x.y}}_aaa_{{a.b}}_bbb`` over ``{"x":{"y":"apple"},"a":{"b":"pear"}}``
  → ``apple_aaa_pear_bbb`` (``type_map.rs:201-218``).
- eval sentinels: missing path → ``NONE``; array value → ``ARRAY``; object
  → ``OBJECT``; string value → itself; **non-string scalars append
  nothing** (the reference uses ``Value::as_str()``, ``type_map.rs:45-55``).
- dotted-path get with numeric segments indexing arrays:
  ``type_map.rs:65-88``.
- route sanitization (ES index-name rules): lowercase; strip
  ``:"*+/\\|?#%<>``; spaces→``_``; then strip ALL leading ``_``, then all
  leading ``.``, then all leading ``-`` (sequential, like Rust
  ``trim_start_matches`` chaining): ``src/elastic.rs:156-182``.

The hot-path (route column over an Arrow batch) uses the vectorized
``sanitise_routes`` / ``eval_template_columns``; the scalar forms exist for
conformance tests and driver-side use.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "dotted_get",
    "IndexPattern",
    "sanitise_route",
    "sanitise_routes",
]

_TEMPLATE_RE = re.compile(r"\{\{([^{}]*)\}\}")
_BAD_CHARS = ':"*+/\\|?#%<>'
_BAD_TABLE = str.maketrans({c: None for c in _BAD_CHARS} | {" ": "_"})


def dotted_get(data: Any, path: str) -> Any:
    """``a.b.0.c`` lookup; numeric segments index lists (type_map.rs:65-88).

    Returns the sentinel ``_MISSING`` (None is a legal value) — callers use
    :func:`IndexPattern.evaluate`; direct users get ``default``.
    """
    cur = data
    for seg in path.split("."):
        is_num = seg.isdigit()
        if isinstance(cur, (list, tuple)):
            if not is_num or int(seg) >= len(cur):
                return _MISSING
            cur = cur[int(seg)]
        elif isinstance(cur, Mapping):
            # a numeric segment never addresses an object (Rust
            # Value::get(usize) on an Object returns None, type_map.rs:68-73)
            if is_num or seg not in cur:
                return _MISSING
            cur = cur[seg]
        else:
            return _MISSING
    return cur


class _Missing:
    def __repr__(self) -> str:  # pragma: no cover
        return "<missing>"


_MISSING = _Missing()


@dataclass(frozen=True)
class IndexPattern:
    """A parsed route template: ``parts`` is a list of
    ``(text, is_eval)`` — literal text or a dotted path to evaluate
    (reference ``IndexPatternObject``, ``type_map.rs:9-35``)."""

    parts: tuple[tuple[str, bool], ...]

    @classmethod
    def parse(cls, template: str) -> "IndexPattern":
        parts: list[tuple[str, bool]] = []
        pos = 0
        for m in _TEMPLATE_RE.finditer(template):
            if m.start() > pos:
                parts.append((template[pos : m.start()], False))
            parts.append((m.group(1), True))
            pos = m.end()
        if pos < len(template):
            parts.append((template[pos:], False))
        return cls(tuple(parts))

    def evaluate(self, record: Mapping[str, Any]) -> str:
        """Route key for one record (``generate_index_pattern``,
        type_map.rs:37-62): missing→NONE, list→ARRAY, dict→OBJECT,
        str→value, other scalars→'' (the as_str() quirk)."""
        out: list[str] = []
        for text, is_eval in self.parts:
            if not is_eval:
                out.append(text)
                continue
            v = dotted_get(record, text)
            if v is _MISSING:
                out.append("NONE")
            elif isinstance(v, (list, tuple)):
                out.append("ARRAY")
            elif isinstance(v, Mapping):
                out.append("OBJECT")
            elif isinstance(v, str):
                out.append(v)
            # non-string scalar (int/float/bool/None): append nothing
        return "".join(out)

    def evaluate_columns(self, batch: pa.Table) -> pa.Array:
        """Vectorized eval over Arrow columns — flat string columns (the
        common case for rule-extracted fields) AND dotted paths through
        nested struct columns (``pc.struct_field`` chains, mirroring the
        scalar ``dotted_get``). Sentinels per the scalar eval: missing
        path / null cell → ``NONE``, struct value → ``OBJECT``, list
        value → ``ARRAY``. Non-string leaf columns are cast to string
        (deviation from the as_str() quirk, here by design: extracted
        columns are typed on purpose and routing on them should use
        their printed form)."""
        n = len(batch)
        pieces: list[pa.Array] = []
        for text, is_eval in self.parts:
            if not is_eval:
                pieces.append(pa.array([text] * n, type=pa.string()))
            else:
                pieces.append(self._eval_path_column(batch, text))
        if not pieces:
            return pa.array([""] * n, type=pa.string())
        out = pieces[0]
        for p in pieces[1:]:
            out = pc.binary_join_element_wise(out, p, "")
        return out

    @staticmethod
    def _eval_path_column(batch: pa.Table, path: str) -> pa.Array:
        """One eval part as a string column: resolve ``a.b.c`` where
        ``a`` is a batch column and the rest traverse struct fields
        (``pc.struct_field`` per segment — the vectorized analog of the
        scalar ``dotted_get``). List positional indexing mid-path drops
        to a per-row fallback for just that piece (rare in routing
        templates; struct chains are the hot nested case)."""
        n = len(batch)
        none_col = pa.array(["NONE"] * n, type=pa.string())
        segs = path.split(".")
        if segs[0] not in batch.column_names:
            return none_col
        col = batch[segs[0]]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for i, seg in enumerate(segs[1:], start=1):
            if pa.types.is_struct(col.type):
                # a numeric segment never addresses an object
                # (type_map.rs:68-73); a missing field is NONE
                if seg.isdigit() or col.type.get_field_index(seg) < 0:
                    return none_col
                col = pc.struct_field(col, seg)
            elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                # per-row list indexing has no null-padding Arrow kernel;
                # evaluate the remaining path per row on this column only
                rest = ".".join(segs[i:])
                vals = []
                for v in col.to_pylist():
                    r = dotted_get(v, rest) if v is not None else _MISSING
                    if r is _MISSING:
                        vals.append("NONE")
                    elif isinstance(r, (list, tuple)):
                        vals.append("ARRAY")
                    elif isinstance(r, Mapping):
                        vals.append("OBJECT")
                    elif isinstance(r, str):
                        vals.append(r)
                    elif r is None:
                        vals.append("NONE")
                    elif isinstance(r, bool):
                        # match the Arrow-cast rendering of the flat path
                        # ("true"/"false", not Python's "True"/"False")
                        vals.append("true" if r else "false")
                    else:
                        vals.append(str(r))
                return pa.array(vals, type=pa.string())
            else:
                return none_col  # scalar mid-path → missing
        # leaf sentinels
        if pa.types.is_struct(col.type):
            return pc.if_else(pc.is_valid(col), "OBJECT", "NONE")
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            return pc.if_else(pc.is_valid(col), "ARRAY", "NONE")
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        col = pc.fill_null(col, "NONE")
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def sanitise_route(source: str) -> str:
    """Scalar route sanitization (``sanitise_string_elastic``,
    src/elastic.rs:156-182)."""
    s = source.lower().translate(_BAD_TABLE)
    return s.lstrip("_").lstrip(".").lstrip("-")


def sanitise_routes(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized route sanitization over an Arrow string array."""
    out = pc.utf8_lower(arr)
    out = pc.replace_substring_regex(out, f"[{re.escape(_BAD_CHARS)}]", "")
    out = pc.replace_substring(out, " ", "_")
    # sequential lstrips (all leading '_', then all '.', then all '-') in
    # one anchored pass: `^_*\.*-*` matches exactly that sequence
    out = pc.replace_substring_regex(out, r"^_*\.*-*", "", max_replacements=1)
    return out
