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


MACHO_MAGIC_64_LE = b"\xcf\xfa\xed\xfe"  # MH_MAGIC_64, little-endian
_LC_UUID = 0x1B
_LC_SYMTAB = 0x02
_N_TYPE_MASK = 0x0E
_N_SECT = 0x0E
_N_STAB = 0xE0


def parse_macho_symtab(data: bytes) -> tuple[str, list[dict]]:
    """Parse a real Mach-O 64-bit (little-endian) binary's LC_UUID +
    LC_SYMTAB into (debug_id, sorted symbol dicts) — the genuine binary
    format inside a dSYM bundle's ``Contents/Resources/DWARF/<binary>``.
    The reference reads these via Sentry's ``symbolic``
    (dsymprocessor/symbolicator.go:92-104); this is the from-scratch
    equivalent for the address->symbol layer: nlist_64 records filtered
    to defined non-debug section symbols (N_SECT, not N_STAB), names
    from the string table, each symbol's end = the next symbol's start
    (the standard symbolicator convention; the last symbol is
    unbounded).  DWARF line/inline info is out of scope — Mach-O-backed
    lookups carry symbol + sym_addr with empty path/line, exactly what
    a symtab-only (non-DWARF) dSYM yields.

    Raises SymbolicationError on structural corruption (truncated
    header/commands/tables, missing LC_UUID or LC_SYMTAB)."""
    import struct
    import uuid as uuid_mod

    def fail(why: str) -> SymbolicationError:
        return SymbolicationError(f"invalid dSYM archive: {why}")

    if len(data) < 32:
        raise fail("truncated Mach-O header")
    magic = data[:4]
    if magic != MACHO_MAGIC_64_LE:
        raise fail("not a 64-bit little-endian Mach-O")
    ncmds, sizeofcmds = struct.unpack_from("<II", data, 16)
    off = 32
    uuid_str: str | None = None
    symtab: tuple[int, int, int, int] | None = None
    end_cmds = 32 + sizeofcmds
    for _ in range(ncmds):
        if off + 8 > len(data) or off + 8 > end_cmds:
            raise fail("truncated load command")
        cmd, cmdsize = struct.unpack_from("<II", data, off)
        if cmdsize < 8 or off + cmdsize > len(data):
            raise fail("load command overruns file")
        if cmd == _LC_UUID:
            if cmdsize < 24:
                raise fail("short LC_UUID")
            uuid_str = str(uuid_mod.UUID(bytes=data[off + 8: off + 24]))
        elif cmd == _LC_SYMTAB:
            if cmdsize < 24:
                raise fail("short LC_SYMTAB")
            symtab = struct.unpack_from("<IIII", data, off + 8)
        off += cmdsize
    if uuid_str is None:
        raise fail("missing LC_UUID")
    if symtab is None:
        raise fail("missing LC_SYMTAB")
    symoff, nsyms, stroff, strsize = symtab
    if symoff + nsyms * 16 > len(data) or stroff + strsize > len(data):
        raise fail("symbol/string table overruns file")
    strtab = data[stroff: stroff + strsize]
    entries: list[tuple[int, str]] = []
    for i in range(nsyms):
        n_strx, n_type, _n_sect, _n_desc, n_value = struct.unpack_from(
            "<IBBHQ", data, symoff + i * 16
        )
        if n_type & _N_STAB:
            continue  # debug stab, not a symbol
        if n_type & _N_TYPE_MASK != _N_SECT:
            continue  # undefined/absolute
        if n_strx >= strsize:
            raise fail("symbol name offset outside string table")
        name_end = strtab.find(b"\x00", n_strx)
        name = strtab[n_strx: name_end if name_end != -1 else strsize].decode(
            "utf-8", "replace"
        )
        entries.append((n_value, name))
    entries.sort()
    symbols: list[dict] = []
    for i, (addr, name) in enumerate(entries):
        end = entries[i + 1][0] if i + 1 < len(entries) else 1 << 63
        symbols.append({"sym_addr": addr, "end": end, "symbol": name})
    return uuid_str, symbols


class DsymArchive:
    """symbolic.Archive equivalent: SymCaches keyed by lowercase debug id
    (dsymprocessor/symbolicator.go:104).  Accepts BOTH archive formats:
    a real Mach-O 64 binary (magic-sniffed; LC_UUID is the debug id,
    LC_SYMTAB the symbol source) and the JSON symbol-table format
    synth_artifacts.write_dsym emits (which adds the DWARF-level
    path/line/inline data Mach-O symtabs don't carry)."""

    def __init__(self, data: bytes) -> None:
        if isinstance(data, (bytes, bytearray)) and data[:4] == MACHO_MAGIC_64_LE:
            debug_id, symbols = parse_macho_symtab(bytes(data))
            self.sym_caches: dict[str, SymCache] = {debug_id.lower(): SymCache(symbols)}
            return
        try:
            payload = json.loads(data)
        except (ValueError, TypeError) as exc:
            raise SymbolicationError(f"invalid dSYM archive: {exc}")
        self.sym_caches = {
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
