"""Synthetic dSYM archive + symcache lookup (the math behind Y3).

The reference delegates DWARF parsing to ``symbolic.NewArchiveFromBytes``
and ``symCache.Lookup(addr)`` (dsymprocessor/symbolicator.go:92-116); its
own real DWARF test blob is absent from the repo (.MISSING_LARGE_BLOBS),
so this engine accepts THREE archive layers: a JSON symbol table
(synth_artifacts.write_dsym: sorted (sym_addr, end, symbol, path,
line[, lang, inlines]) records), a real Mach-O 64 symtab
(parse_macho_archive: LC_UUID + LC_SYMTAB nlist_64 records), and — when
the Mach-O carries a ``__DWARF,__debug_line`` section — a REAL DWARF
v2-v4 line-number program (parse_dwarf_debug_line) resolving
addr -> (file, line).  Lookup semantics and
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
    def __init__(
        self,
        symbols: list[dict],
        line_rows: "list[tuple[int, str | None, int]] | None" = None,
    ) -> None:
        self.symbols = sorted(symbols, key=lambda s: s["sym_addr"])
        self._starts = [s["sym_addr"] for s in self.symbols]
        # DWARF .debug_line rows: (address, path|None, line), sorted;
        # path None marks an end_sequence boundary (range closed)
        self._line_rows = sorted(line_rows) if line_rows else None
        self._line_addrs = [r[0] for r in self._line_rows] if line_rows else None

    def _line_for(self, addr: int) -> "tuple[str, int] | None":
        """Resolve addr -> (path, line) from the DWARF line table: the
        last row at or before addr owns the range up to the next row;
        end_sequence rows close a range (no line info past them)."""
        if not self._line_rows:
            return None
        i = bisect.bisect_right(self._line_addrs, addr) - 1
        if i < 0:
            return None
        row_addr, path, line = self._line_rows[i]
        del row_addr
        if path is None:
            return None
        return path, line

    def lookup(self, addr: int) -> list[DsymLocation]:
        i = bisect.bisect_right(self._starts, addr) - 1
        if i < 0:
            return []
        sym = self.symbols[i]
        if addr >= sym.get("end", sym["sym_addr"]):
            return []
        dwarf_line = None
        if "path" not in sym:
            dwarf_line = self._line_for(addr)
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
                path=dwarf_line[0] if dwarf_line else sym.get("path", ""),
                instr_addr=addr,
                lang=sym.get("lang", ""),
                line=dwarf_line[1] if dwarf_line else sym.get("line", 0),
                sym_addr=sym["sym_addr"],
                symbol=sym.get("symbol", ""),
            )
        )
        return locations


MACHO_MAGIC_64_LE = b"\xcf\xfa\xed\xfe"  # MH_MAGIC_64, little-endian
_LC_UUID = 0x1B
_LC_SYMTAB = 0x02
_LC_SEGMENT_64 = 0x19
_N_TYPE_MASK = 0x0E
_N_SECT = 0x0E
_N_STAB = 0xE0


def _read_uleb(data: bytes, off: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if off >= len(data):
            raise SymbolicationError("invalid dSYM archive: truncated ULEB128")
        b = data[off]
        off += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, off
        shift += 7


def _read_sleb(data: bytes, off: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if off >= len(data):
            raise SymbolicationError("invalid dSYM archive: truncated SLEB128")
        b = data[off]
        off += 1
        result |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            if b & 0x40:
                result -= 1 << shift
            return result, off


def parse_dwarf_debug_line(section: bytes) -> "list[tuple[int, str | None, int]]":
    """Decode a real DWARF ``.debug_line`` section (versions 2-4, the
    formats Mach-O dSYMs carry) into sorted (address, path, line) rows;
    an end_sequence emits (address, None, 0) closing the range.  This is
    the full line-number state machine of DWARF spec §6.2: special
    opcodes (line_base/line_range advance), all 12 standard opcodes and
    the extended set_address / end_sequence / define_file — the layer
    the reference delegates to symbolic-go
    (dsymprocessor/symbolicator.go:95-104) for file/line resolution."""
    import struct

    def fail(why: str) -> SymbolicationError:
        return SymbolicationError(f"invalid dSYM archive: {why}")

    rows: list[tuple[int, str | None, int]] = []
    off = 0
    while off < len(section):
        if off + 4 > len(section):
            raise fail("truncated .debug_line unit length")
        (unit_len,) = struct.unpack_from("<I", section, off)
        if unit_len == 0xFFFFFFFF:
            raise fail("64-bit DWARF .debug_line units are not supported")
        unit_end = off + 4 + unit_len
        if unit_end > len(section):
            raise fail(".debug_line unit overruns section")
        p = off + 4
        if p + 2 > unit_end:
            raise fail("truncated .debug_line version")
        (version,) = struct.unpack_from("<H", section, p)
        p += 2
        if version < 2 or version > 4:
            raise fail(f"unsupported .debug_line version {version}")
        (header_len,) = struct.unpack_from("<I", section, p)
        p += 4
        prog_start = p + header_len
        if prog_start > unit_end:
            raise fail(".debug_line header overruns unit")
        min_inst = section[p]
        p += 1
        if version >= 4:
            max_ops = section[p]
            p += 1
            if max_ops != 1:
                raise fail("VLIW max_operations_per_instruction unsupported")
        default_is_stmt = section[p]
        p += 1
        line_base = struct.unpack_from("<b", section, p)[0]
        p += 1
        line_range = section[p]
        p += 1
        opcode_base = section[p]
        p += 1
        if line_range == 0:
            raise fail("line_range of 0")
        std_lens = list(section[p: p + opcode_base - 1])
        p += opcode_base - 1
        # include_directories: sequence of NUL-terminated strings, empty ends
        dirs: list[str] = []
        while True:
            end = section.find(b"\x00", p, prog_start)
            if end < 0:
                raise fail("unterminated include_directories")
            if end == p:
                p = end + 1
                break
            dirs.append(section[p:end].decode("utf-8", "replace"))
            p = end + 1
        files: list[str] = []
        while True:
            end = section.find(b"\x00", p, prog_start)
            if end < 0:
                raise fail("unterminated file_names")
            if end == p:
                p = end + 1
                break
            name = section[p:end].decode("utf-8", "replace")
            p = end + 1
            dir_idx, p = _read_uleb(section, p)
            _, p = _read_uleb(section, p)  # mtime
            _, p = _read_uleb(section, p)  # length
            if dir_idx and dir_idx <= len(dirs):
                name = dirs[dir_idx - 1] + "/" + name
            files.append(name)

        def file_path(idx: int) -> str:
            # DWARF file numbers are 1-based in v2-v4
            if 1 <= idx <= len(files):
                return files[idx - 1]
            return f"<file {idx}>"

        # state machine
        q = prog_start
        address, file_idx, line = 0, 1, 1
        while q < unit_end:
            op = section[q]
            q += 1
            if op >= opcode_base:  # special opcode
                adj = op - opcode_base
                address += (adj // line_range) * min_inst
                line += line_base + (adj % line_range)
                rows.append((address, file_path(file_idx), line))
            elif op == 0:  # extended
                ext_len, q = _read_uleb(section, q)
                ext_end = q + ext_len
                if ext_end > unit_end or ext_len == 0:
                    raise fail("extended opcode overruns unit")
                sub = section[q]
                if sub == 1:  # DW_LNE_end_sequence
                    rows.append((address, None, 0))
                    address, file_idx, line = 0, 1, 1
                elif sub == 2:  # DW_LNE_set_address
                    if ext_len != 9:
                        raise fail("DW_LNE_set_address with non-8-byte address")
                    (address,) = struct.unpack_from("<Q", section, q + 1)
                elif sub == 3:  # DW_LNE_define_file
                    r = q + 1
                    end = section.find(b"\x00", r, ext_end)
                    if end < 0:
                        raise fail("unterminated DW_LNE_define_file name")
                    name = section[r:end].decode("utf-8", "replace")
                    r = end + 1
                    dir_idx, r = _read_uleb(section, r)
                    _, r = _read_uleb(section, r)
                    _, r = _read_uleb(section, r)
                    if dir_idx and dir_idx <= len(dirs):
                        name = dirs[dir_idx - 1] + "/" + name
                    files.append(name)
                # unknown extended opcodes are skipped per spec
                q = ext_end
            elif op == 1:  # DW_LNS_copy
                rows.append((address, file_path(file_idx), line))
            elif op == 2:  # DW_LNS_advance_pc
                delta, q = _read_uleb(section, q)
                address += delta * min_inst
            elif op == 3:  # DW_LNS_advance_line
                delta, q = _read_sleb(section, q)
                line += delta
            elif op == 4:  # DW_LNS_set_file
                file_idx, q = _read_uleb(section, q)
            elif op == 5:  # DW_LNS_set_column
                _, q = _read_uleb(section, q)
            elif op == 6:  # DW_LNS_negate_stmt
                pass
            elif op == 7:  # DW_LNS_set_basic_block
                pass
            elif op == 8:  # DW_LNS_const_add_pc
                adj = 255 - opcode_base
                address += (adj // line_range) * min_inst
            elif op == 9:  # DW_LNS_fixed_advance_pc
                if q + 2 > unit_end:
                    raise fail("truncated DW_LNS_fixed_advance_pc")
                address += struct.unpack_from("<H", section, q)[0]
                q += 2
            elif op in (10, 11):  # prologue_end / epilogue_begin
                pass
            elif op == 12:  # DW_LNS_set_isa
                _, q = _read_uleb(section, q)
            else:
                # vendor standard opcode: skip declared ULEB operands
                for _ in range(std_lens[op - 1] if op - 1 < len(std_lens) else 0):
                    _, q = _read_uleb(section, q)
        del default_is_stmt
        off = unit_end
    rows.sort(key=lambda r: (r[0], r[1] is None))
    return rows


def parse_macho_symtab(data: bytes) -> tuple[str, list[dict]]:
    """Back-compat symtab-only view of parse_macho_archive."""
    debug_id, symbols, _ = parse_macho_archive(data)
    return debug_id, symbols


def parse_macho_archive(
    data: bytes,
) -> "tuple[str, list[dict], list[tuple[int, str | None, int]] | None]":
    """Parse a real Mach-O 64-bit (little-endian) binary's LC_UUID +
    LC_SYMTAB into (debug_id, sorted symbol dicts) — the genuine binary
    format inside a dSYM bundle's ``Contents/Resources/DWARF/<binary>``.
    The reference reads these via Sentry's ``symbolic``
    (dsymprocessor/symbolicator.go:92-104); this is the from-scratch
    equivalent for the address->symbol layer: nlist_64 records filtered
    to defined non-debug section symbols (N_SECT, not N_STAB), names
    from the string table, each symbol's end = the next symbol's start
    (the standard symbolicator convention; the last symbol is
    unbounded).  When the binary carries a ``__DWARF,__debug_line``
    section (LC_SEGMENT_64 walk), the REAL DWARF line program is decoded
    (parse_dwarf_debug_line) and returned as the third element for
    address->file/line resolution; symtab-only binaries return None and
    their lookups carry symbol + sym_addr with empty path/line.

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
    debug_line_loc: tuple[int, int] | None = None
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
        elif cmd == _LC_SEGMENT_64:
            if cmdsize < 72:
                raise fail("short LC_SEGMENT_64")
            (nsects,) = struct.unpack_from("<I", data, off + 64)
            if cmdsize < 72 + nsects * 80:
                raise fail("LC_SEGMENT_64 sections overrun command")
            for si in range(nsects):
                so = off + 72 + si * 80
                sectname = data[so: so + 16].rstrip(b"\x00")
                segname = data[so + 16: so + 32].rstrip(b"\x00")
                if sectname == b"__debug_line" and segname == b"__DWARF":
                    size, offset = struct.unpack_from("<QI", data, so + 40)
                    if offset + size > len(data):
                        raise fail("__debug_line section overruns file")
                    debug_line_loc = (offset, size)
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
    line_rows = None
    if debug_line_loc is not None:
        sect_off, sect_size = debug_line_loc
        line_rows = parse_dwarf_debug_line(data[sect_off: sect_off + sect_size])
    return uuid_str, symbols, line_rows


class DsymArchive:
    """symbolic.Archive equivalent: SymCaches keyed by lowercase debug id
    (dsymprocessor/symbolicator.go:104).  Accepts BOTH archive formats:
    a real Mach-O 64 binary (magic-sniffed; LC_UUID is the debug id,
    LC_SYMTAB the symbol source, a ``__debug_line`` section the
    file/line source) and the JSON symbol-table format
    synth_artifacts.write_dsym emits (which also carries inline
    chains, the one DWARF layer the Mach-O path leaves synthetic)."""

    def __init__(self, data: bytes) -> None:
        if isinstance(data, (bytes, bytearray)) and data[:4] == MACHO_MAGIC_64_LE:
            debug_id, symbols, line_rows = parse_macho_archive(bytes(data))
            self.sym_caches: dict[str, SymCache] = {
                debug_id.lower(): SymCache(symbols, line_rows=line_rows)
            }
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
