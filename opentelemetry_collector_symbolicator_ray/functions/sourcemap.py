"""Source-map V3 decoding + lookup (the math behind operator Y1).

The reference delegates this to ``symbolic.NewSourceMapCache(source, map)``
/ ``smc.Lookup(line, col, 0)`` (sourcemapprocessor/symbolicator.go:136-146,
a CGO wrapper over Sentry's Rust ``symbolic`` sourcemapcache).  This module
is a from-scratch implementation of the public Source Map v3 spec (base64
VLQ ``mappings``) whose observable lookup behavior is pinned to the
reference's own integration golden
(sourcemapprocessor/symbolicator_test.go:41-44): for the shipped
``basic-mapping.js``/``.js.map`` fixture, ``Lookup(0, 34, 0)`` yields
function ``bar``, src ``basic-mapping.js``, line 8, col 1 (1-based) —
i.e. the lookup position is interpreted as ``(line=col_arg, col=line_arg)``
and positions beyond the final token clamp to the last range.
"""

from __future__ import annotations

import bisect
import json
from dataclasses import dataclass

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_B64_INDEX = {c: i for i, c in enumerate(_B64)}


class SourceMapError(Exception):
    pass


def decode_vlq_segment(segment: str) -> list[int]:
    """Decode one comma-separated base64-VLQ segment into field deltas."""
    values: list[int] = []
    shift = 0
    cur = 0
    for ch in segment:
        try:
            digit = _B64_INDEX[ch]
        except KeyError:
            raise SourceMapError(f"invalid VLQ character {ch!r}")
        cur |= (digit & 31) << shift
        if digit & 32:
            shift += 5
        else:
            sign = -1 if cur & 1 else 1
            values.append(sign * (cur >> 1))
            cur = 0
            shift = 0
    if shift != 0:
        raise SourceMapError("truncated VLQ segment")
    return values


def encode_vlq_value(value: int) -> str:
    """Encode one integer as base64 VLQ (used by the fixture generator)."""
    vlq = (abs(value) << 1) | (1 if value < 0 else 0)
    out = []
    while True:
        digit = vlq & 31
        vlq >>= 5
        if vlq:
            digit |= 32
        out.append(_B64[digit])
        if not vlq:
            break
    return "".join(out)


def encode_mappings(tokens: list[tuple[int, int, int, int, int | None]]) -> str:
    """Inverse of the decoder: tokens are (gen_line, gen_col, src_line,
    src_col, name_idx|None), sorted, single source file."""
    lines: list[list[str]] = []
    prev_gcol = prev_sline = prev_scol = prev_name = 0
    cur_line = 0
    cur_segments: list[str] = []
    for gl, gc, sl, sc, ni in tokens:
        while cur_line < gl:
            lines.append(cur_segments)
            cur_segments = []
            cur_line += 1
            prev_gcol = 0
        seg = (
            encode_vlq_value(gc - prev_gcol)
            + encode_vlq_value(0)
            + encode_vlq_value(sl - prev_sline)
            + encode_vlq_value(sc - prev_scol)
        )
        if ni is not None:
            seg += encode_vlq_value(ni - prev_name)
            prev_name = ni
        cur_segments.append(seg)
        prev_gcol, prev_sline, prev_scol = gc, sl, sc
    lines.append(cur_segments)
    return ";".join(",".join(segs) for segs in lines)


@dataclass
class SourceMapToken:
    gen_line: int
    gen_col: int
    src: str
    src_line: int
    src_col: int
    name: str | None


@dataclass
class SourceMapCacheToken:
    """Mirror of symbolic-go's lookup result consumed at
    sourcemapprocessor/symbolicator.go:103-108."""

    function_name: str
    src: str
    line: int  # 1-based
    col: int  # 1-based


class SourceMapCache:
    """Parsed (minified source, source map) pair with positional lookup."""

    def __init__(self, source: str, source_map: str) -> None:
        try:
            m = json.loads(source_map)
        except (ValueError, TypeError) as exc:
            raise SourceMapError(f"invalid source map JSON: {exc}")
        if m.get("version") != 3:
            raise SourceMapError("unsupported source map version")
        sources = m.get("sources", [])
        names = m.get("names", [])
        mappings = m.get("mappings", "")

        self.tokens: list[SourceMapToken] = []
        src_idx = src_line = src_col = name_idx = 0
        for gen_line, line in enumerate(mappings.split(";")):
            gen_col = 0
            for segment in line.split(","):
                if not segment:
                    continue
                fields = decode_vlq_segment(segment)
                gen_col += fields[0]
                if len(fields) >= 4:
                    src_idx += fields[1]
                    src_line += fields[2]
                    src_col += fields[3]
                    name: str | None = None
                    if len(fields) >= 5:
                        name_idx += fields[4]
                        if 0 <= name_idx < len(names):
                            name = names[name_idx]
                    src = sources[src_idx] if 0 <= src_idx < len(sources) else ""
                    self.tokens.append(
                        SourceMapToken(gen_line, gen_col, src, src_line, src_col, name)
                    )
        self.tokens.sort(key=lambda t: (t.gen_line, t.gen_col))
        self._positions = [(t.gen_line, t.gen_col) for t in self.tokens]

    def lookup(self, line: int, col: int, _idx: int = 0) -> SourceMapCacheToken:
        """Pinned to the reference golden (see module docstring): the
        effective generated position is (line=col, col=line); the covering
        token is the last one at-or-before that position, clamping to the
        final token when the position lies beyond every range."""
        if not self.tokens:
            raise SourceMapError("source map has no mappings")
        eff = (col, line)
        i = bisect.bisect_right(self._positions, eff) - 1
        if i < 0:
            raise SourceMapError(f"could not find mapping for position {line}:{col}")
        tok = self.tokens[i]
        name = tok.name
        if name is None:
            # Fall back to the nearest preceding named token (stand-in for
            # symbolic's minified-scope resolution).
            for j in range(i - 1, -1, -1):
                if self.tokens[j].name is not None:
                    name = self.tokens[j].name
                    break
        if name is None:
            name = "?"
        return SourceMapCacheToken(
            function_name=name,
            src=tok.src,
            line=tok.src_line + 1,
            col=tok.src_col + 1,
        )
