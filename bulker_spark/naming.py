"""Identifier adaptation: make arbitrary JSON keys valid warehouse columns.

Mirrors the reference's naming layer
(``/root/reference/bulkerlib/implementations/sql/table_helper.go:367-458``):

- strip characters outside ``\\p{L} \\p{N} _ $ space -`` then normalize
- an all-stripped name becomes ``column_<hash>``
- truncate to the dialect's max identifier length (63 postgres default)
- optional case folding (``toSameCase`` stream option → lower/upper)
- results are memoized (the reference keeps a 100k-entry cache,
  ``bulker.go:20,126-129``).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

# Allowed inside an identifier: letters, digits, underscore, dollar, space,
# dash (reference regex: [^\p{L}_\d $-], table_helper.go:22-28).
_STRIP_RE = re.compile(r"[^\w $-]", re.UNICODE)
_WS_RE = re.compile(r"[ \-$]+")


@dataclass
class NameTransformer:
    """Case-folding used by flatten (``toSameCase`` option)."""

    mode: str = "none"  # none | lower | upper

    def transform(self, name: str) -> str:
        if self.mode == "lower":
            return name.lower()
        if self.mode == "upper":
            return name.upper()
        return name


@dataclass
class IdentifierAdapter:
    max_len: int = 63
    case: str = "none"  # none | lower | upper
    _cache: dict[str, str] = field(default_factory=dict)

    def adapt(self, name: str) -> str:
        hit = self._cache.get(name)
        if hit is not None:
            return hit
        out = _STRIP_RE.sub("", name)
        out = _WS_RE.sub("_", out)  # leading/trailing "_" kept (_timestamp)
        if out == "" or not re.match(r"^[A-Za-z_]", out):
            prefix = "column_" if out == "" else ""
            if out == "":
                out = hashlib.md5(name.encode()).hexdigest()[:8]
            out = f"{prefix}{out}" if prefix else f"_{out}"
        if self.case == "lower":
            out = out.lower()
        elif self.case == "upper":
            out = out.upper()
        if len(out) > self.max_len:
            digest = hashlib.md5(out.encode()).hexdigest()[:8]
            out = out[: self.max_len - 9] + "_" + digest
        if len(self._cache) < 100_000:
            self._cache[name] = out
        return out
