"""Pure-Python decoders for R serialization formats used by the reference repo.

The reference (matrix-profile-foundation/matrixprofiler) stores its golden test
vectors in two R-native formats:

* ``data/motifs_discords_small.rda`` — bzip2-compressed RDA (``RDX2\n`` magic +
  XDR serialization stream) holding the 875-point test series.
* ``tests/testthat/_snaps/*.md`` — testthat snapshot files whose
  ``expect_snapshot_value(style="serialize")`` blocks are base64 of an
  *uncompressed* RDS XDR stream (magic ``X\n``), and whose
  ``style="json"``/``"json2"`` blocks are plain JSON.

This module parses the XDR ("X\n") serialization format directly — no R
toolchain required. Only the SEXP types the reference actually emits are
supported: NULL, symbols, pairlists (for attributes / named lists), logical,
integer, real, complex, string, character and generic vectors.

Format reference: R Internals §1.8 "Serialization Formats" (public R docs).
"""

from __future__ import annotations

import base64
import bz2
import gzip
import json
import re
import struct
from pathlib import Path
from typing import Any

# SEXP type codes (R Internals, SEXPTYPE)
NILSXP = 0
SYMSXP = 1
LISTSXP = 2
CHARSXP = 9
LGLSXP = 10
INTSXP = 13
REALSXP = 14
CPLXSXP = 15
STRSXP = 16
VECSXP = 19
# pseudo-codes used by the serializer
REFSXP = 255
NILVALUE_SXP = 254
GLOBALENV_SXP = 253
UNBOUNDVALUE_SXP = 252
MISSINGARG_SXP = 251
BASENAMESPACE_SXP = 250
NAMESPACESXP = 249
PACKAGESXP = 248
PERSISTSXP = 247

NA_INTEGER = -2147483648


class _XDR:
    """Big-endian (XDR) cursor over an R serialization payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.refs: list[Any] = []  # reference table (1-based in format)

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"short read at {self.pos}")
        self.pos += n
        return b

    def int32(self) -> int:
        return struct.unpack(">i", self.read(4))[0]

    def double(self) -> float:
        return struct.unpack(">d", self.read(8))[0]

    # ---- header ----
    def read_header(self) -> None:
        magic = self.read(2)
        if magic != b"X\n":
            raise ValueError(f"not an XDR R stream (magic={magic!r})")
        version = self.int32()
        _writer = self.int32()
        _reader = self.int32()
        if version >= 3:
            enc_len = self.int32()
            self.read(enc_len)  # native encoding name, e.g. "UTF-8"

    # ---- items ----
    def read_item(self) -> Any:
        flags = self.int32()
        ptype = flags & 255
        has_attr = bool(flags & (1 << 9))
        has_tag = bool(flags & (1 << 10))

        if ptype == NILVALUE_SXP or ptype == NILSXP:
            return None
        if ptype == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self.int32()
            return self.refs[idx - 1]
        if ptype == SYMSXP:
            name = self.read_item()  # CHARSXP
            self.refs.append(name)
            return name
        if ptype == CHARSXP:
            n = self.int32()
            if n == -1:
                return None  # NA_character_
            return self.read(n).decode("utf-8", errors="replace")
        if ptype == LISTSXP:
            # dotted-pair list: attributes / named-list spine
            out = []
            while True:
                attr = self.read_item() if has_attr else None
                tag = self.read_item() if has_tag else None
                car = self.read_item()
                out.append((tag, car, attr))
                flags = self.int32()
                ptype = flags & 255
                if ptype in (NILVALUE_SXP, NILSXP):
                    break
                if ptype != LISTSXP:
                    # next item is the CDR terminator of another type
                    self.pos -= 4
                    cdr = self.read_item()
                    out.append((None, cdr, None))
                    break
                has_attr = bool(flags & (1 << 9))
                has_tag = bool(flags & (1 << 10))
            return RPairList(out)
        if ptype == LGLSXP:
            n = self.int32()
            vals = [self.int32() for _ in range(n)]
            obj = [None if v == NA_INTEGER else bool(v) for v in vals]
            return self._with_attrs(obj, has_attr)
        if ptype == INTSXP:
            n = self.int32()
            obj = [self.int32() for _ in range(n)]
            obj = [None if v == NA_INTEGER else v for v in obj]
            return self._with_attrs(obj, has_attr)
        if ptype == REALSXP:
            n = self.int32()
            obj = list(struct.unpack(f">{n}d", self.read(8 * n)))
            return self._with_attrs(obj, has_attr)
        if ptype == CPLXSXP:
            n = self.int32()
            raw = struct.unpack(f">{2 * n}d", self.read(16 * n))
            obj = [complex(raw[2 * i], raw[2 * i + 1]) for i in range(n)]
            return self._with_attrs(obj, has_attr)
        if ptype == STRSXP:
            n = self.int32()
            obj = [self.read_item() for _ in range(n)]
            return self._with_attrs(obj, has_attr)
        if ptype == VECSXP:
            n = self.int32()
            obj = [self.read_item() for _ in range(n)]
            return self._with_attrs(obj, has_attr)
        raise ValueError(f"unsupported SEXP type {ptype} at offset {self.pos - 4}")

    def _with_attrs(self, obj: Any, has_attr: bool) -> Any:
        if not has_attr:
            return obj
        attrs = self.read_item()
        return RObject(obj, attrs)


class RPairList:
    """Parsed LISTSXP spine: list of (tag, value, attr) triples."""

    def __init__(self, items: list[tuple[Any, Any, Any]]):
        self.items = items

    def as_dict(self) -> dict[str, Any]:
        return {t: v for t, v, _ in self.items if t is not None}


class RObject:
    """A vector with attributes (e.g. names) attached."""

    def __init__(self, value: Any, attrs: Any):
        self.value = value
        self.attrs = attrs.as_dict() if isinstance(attrs, RPairList) else {}

    def as_named(self) -> dict[str, Any]:
        names = self.attrs.get("names")
        if names is None:
            raise ValueError("no names attribute")
        vals = self.value
        return {n: simplify(v) for n, v in zip(names, vals)}


def simplify(obj: Any) -> Any:
    """Strip RObject wrappers; named lists → dicts."""
    if isinstance(obj, RObject):
        names = obj.attrs.get("names")
        if names is not None and isinstance(obj.value, list):
            return {n: simplify(v) for n, v in zip(names, obj.value)}
        return simplify(obj.value)
    if isinstance(obj, list):
        return [simplify(v) for v in obj]
    if isinstance(obj, RPairList):
        return {t: simplify(v) for t, v, _ in obj.items if t is not None}
    return obj


def parse_xdr(data: bytes) -> Any:
    x = _XDR(data)
    x.read_header()
    return simplify(x.read_item())


def load_rda(path: str | Path) -> dict[str, Any]:
    """Load an .rda (RDX2/RDX3) file → {object_name: value}."""
    raw = Path(path).read_bytes()
    if raw[:3] == b"BZh":
        raw = bz2.decompress(raw)
    elif raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    elif raw[:4] == b"\x28\xb5\x2f\xfd":
        raise ValueError("zstd-compressed rda not supported here")
    if not raw.startswith(b"RDX"):
        raise ValueError(f"not an RDA file: {raw[:8]!r}")
    # after "RDX2\n" the payload is a standard serialization stream whose
    # top object is a pairlist of (name = value)
    payload = raw[5:]
    x = _XDR(payload)
    x.read_header()
    top = x.read_item()
    if isinstance(top, RPairList):
        return {t: simplify(v) for t, v, _ in top.items if t is not None}
    raise ValueError("unexpected RDA top-level object")


def load_rds_b64(b64_text: str) -> Any:
    """Decode a testthat style='serialize' snapshot blob (base64 RDS XDR)."""
    data = base64.b64decode(re.sub(r"\s+", "", b64_text))
    return parse_xdr(data)


_SNAP_HEADER = re.compile(r"^# (.+)$")


def parse_snapshot_md(path: str | Path) -> dict[str, list[Any]]:
    """Parse a testthat _snaps/*.md file.

    Returns {section_title: [decoded_block, ...]}. Each indented (4-space)
    block is either base64 RDS (decoded to Python values) or JSON.
    Non-decodable blocks (e.g. printed output in algorithms.md) are kept as
    raw strings.
    """
    text = Path(path).read_text()
    out: dict[str, list[Any]] = {}
    title = None
    block: list[str] = []

    def flush():
        if title is None or not block:
            block.clear()
            return
        body = "\n".join(block).strip()
        decoded: Any
        stripped = re.sub(r"\s+", "", body)
        if re.fullmatch(r"[A-Za-z0-9+/=]+", stripped) and stripped.startswith("WAoA"):
            decoded = load_rds_b64(stripped)
        else:
            try:
                decoded = json.loads(body)
            except json.JSONDecodeError:
                decoded = body
        out.setdefault(title, []).append(decoded)
        block.clear()

    for line in text.splitlines():
        m = _SNAP_HEADER.match(line)
        if m:
            flush()
            title = m.group(1).strip()
            continue
        if line.startswith("    "):
            block.append(line[4:])
        elif line.strip() == "" and block:
            block.append("")
        else:
            flush()
    flush()
    return out


def snapshot_value(decoded: Any) -> Any:
    """testthat style='json2'/'serialize' wraps values as
    {"type": ..., "attributes": {...}, "value": [...]}. Unwrap recursively."""
    if isinstance(decoded, dict) and "type" in decoded and "value" in decoded:
        t = decoded["type"]
        v = decoded["value"]
        attrs = decoded.get("attributes") or {}
        if t == "list":
            names = snapshot_value(attrs.get("names")) if "names" in attrs else None
            vals = [snapshot_value(x) for x in v]
            if names:
                return dict(zip(names, vals))
            return vals
        if t in ("double", "integer", "logical", "character"):
            return v
        return v
    return decoded


if __name__ == "__main__":
    import sys

    ref = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    d = load_rda(ref / "data/motifs_discords_small.rda")
    series = d["motifs_discords_small"]
    print("motifs_discords_small:", len(series), series[:3], series[-1])
    for snap in sorted((ref / "tests/testthat/_snaps").glob("*.md")):
        sections = parse_snapshot_md(snap)
        print(f"{snap.name}: {[(k, len(v)) for k, v in sections.items()]}")
