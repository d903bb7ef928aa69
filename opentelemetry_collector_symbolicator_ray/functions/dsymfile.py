"""Synthetic dSYM archive + symcache lookup (the math behind Y3).

The reference delegates DWARF parsing to ``symbolic.NewArchiveFromBytes``
and ``symCache.Lookup(addr)`` (dsymprocessor/symbolicator.go:92-116); its
own real DWARF test blob is absent from the repo (.MISSING_LARGE_BLOBS),
so this engine defines its archive format as a JSON symbol table written
by synth_artifacts.write_dsym: sorted (sym_addr, end, symbol, path,
line[, lang, inlines]) records with bisect lookup.  Lookup semantics and
error texts mirror dsymprocessor/symbolicator.go:104-116, and the
address math is anchored to the reference golden
(dsymprocessor/symbolicator_test.go:31-41): lookup(100436) -> [main],
sym_addr 100372.
"""

from __future__ import annotations

import bisect
import json
from dataclasses import dataclass

from ..errors import SymbolicationError


@dataclass
class DsymLocation:
    """Mirror of mappedDSYMStackFrame (dsymprocessor/symbolicator.go:62-69)."""

    path: str
    instr_addr: int
    lang: str
    line: int
    sym_addr: int
    symbol: str


class SymCache:
    def __init__(self, symbols: list[dict]) -> None:
        self.symbols = sorted(symbols, key=lambda s: s["sym_addr"])
        self._starts = [s["sym_addr"] for s in self.symbols]

    def lookup(self, addr: int) -> list[DsymLocation]:
        i = bisect.bisect_right(self._starts, addr) - 1
        if i < 0:
            return []
        sym = self.symbols[i]
        if addr >= sym.get("end", sym["sym_addr"]):
            return []
        locations = []
        # DWARF-style inline expansion: innermost inline frames first,
        # then the containing symbol (consumed 1->N at
        # dsymprocessor/logs_processor.go:126-133).
        for inline in sym.get("inlines", []):
            locations.append(
                DsymLocation(
                    path=inline.get("path", ""),
                    instr_addr=addr,
                    lang=inline.get("lang", sym.get("lang", "")),
                    line=inline.get("line", 0),
                    sym_addr=sym["sym_addr"],
                    symbol=inline.get("symbol", ""),
                )
            )
        locations.append(
            DsymLocation(
                path=sym.get("path", ""),
                instr_addr=addr,
                lang=sym.get("lang", ""),
                line=sym.get("line", 0),
                sym_addr=sym["sym_addr"],
                symbol=sym.get("symbol", ""),
            )
        )
        return locations


class DsymArchive:
    """symbolic.Archive equivalent: SymCaches keyed by lowercase debug id
    (dsymprocessor/symbolicator.go:104)."""

    def __init__(self, data: bytes) -> None:
        try:
            payload = json.loads(data)
        except (ValueError, TypeError) as exc:
            raise SymbolicationError(f"invalid dSYM archive: {exc}")
        self.sym_caches: dict[str, SymCache] = {
            str(payload.get("debug_id", "")).lower(): SymCache(payload.get("symbols", []))
        }

    def lookup(self, debug_id: str, addr: int) -> list[DsymLocation]:
        sym_cache = self.sym_caches.get(debug_id.lower())
        if sym_cache is None:
            raise SymbolicationError(f"could not find symcache for uuid {debug_id}")
        locations = sym_cache.lookup(addr)
        if not locations:
            raise SymbolicationError(f"could not find symbol at location {addr}")
        return locations
