"""Synthetic dSYM archive + symcache lookup (the math behind Y3).

The reference delegates DWARF parsing to ``symbolic.NewArchiveFromBytes``
and ``symCache.Lookup(addr)`` (dsymprocessor/symbolicator.go:92-116); its
own real DWARF test blob is absent from the repo (.MISSING_LARGE_BLOBS),
so this engine accepts THREE archive layers: a JSON symbol table
(synth_artifacts.write_dsym: sorted (sym_addr, end, symbol, path,
line[, lang, inlines]) records), a real Mach-O 64 symtab
(parse_macho_archive: LC_UUID + LC_SYMTAB nlist_64 records), and — when
the Mach-O carries ``__DWARF`` sections — REAL DWARF v2-v4: the
``.debug_line`` line-number program (parse_dwarf_debug_line) resolving
addr -> (file, line), and ``.debug_info``/``.debug_abbrev`` inline
DIEs (parse_dwarf_debug_info) yielding standard inline unwinding
(innermost frame = PC's line entry, outer frames = call sites).
Lookup semantics and
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


@dataclass
class DwarfData:
    """Decoded DWARF payload of a Mach-O dSYM: .debug_line rows + the
    unit file table, and .debug_info inline records."""

    line_rows: "list[tuple[int, str | None, int]]"
    files: list[str]
    inlines: list[dict]


class SymCache:
    def __init__(
        self,
        symbols: list[dict],
        line_rows: "list[tuple[int, str | None, int]] | None" = None,
        dwarf: "DwarfData | None" = None,
    ) -> None:
        self.symbols = sorted(symbols, key=lambda s: s["sym_addr"])
        self._starts = [s["sym_addr"] for s in self.symbols]
        if dwarf is not None and line_rows is None:
            line_rows = dwarf.line_rows
        # DWARF .debug_line rows: (address, path|None, line), sorted;
        # path None marks an end_sequence boundary (range closed)
        self._line_rows = sorted(line_rows) if line_rows else None
        self._line_addrs = [r[0] for r in self._line_rows] if line_rows else None
        self._files = dwarf.files if dwarf else []
        # inline records sorted outer-first within an address: by
        # (low asc, depth asc) so a containing-addr scan yields the
        # outer->inner chain directly
        self._inlines = (
            sorted(dwarf.inlines, key=lambda r: (r["low"], r["depth"]))
            if dwarf and dwarf.inlines
            else []
        )

    def _file(self, idx: int) -> str:
        if 1 <= idx <= len(self._files):
            return self._files[idx - 1]
        return ""

    def _inline_chain(self, addr: int) -> list[dict]:
        """Inline records whose [low, high) contains addr, outer first.
        Inline DIE lists are subprogram-sized (a handful of records per
        function), so a linear scan is the right cost here."""
        chain = [r for r in self._inlines if r["low"] <= addr < r["high"]]
        chain.sort(key=lambda r: r["depth"])
        return chain

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
            chain = self._inline_chain(addr)
            if chain:
                return self._dwarf_inline_locations(addr, sym, chain)
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

    def _dwarf_inline_locations(
        self, addr: int, sym: dict, chain: list[dict]
    ) -> list[DsymLocation]:
        """Standard DWARF inline unwinding (what symbolic-go emits): the
        innermost inline frame carries the line-table entry at the PC;
        each outer frame carries the CALL SITE (call_file/call_line) of
        the inline nested inside it; the physical symtab frame last."""
        inner = self._line_for(addr) or ("", 0)
        frames: list[DsymLocation] = []
        for j in range(len(chain) - 1, -1, -1):
            rec = chain[j]
            if j == len(chain) - 1:
                path, line = inner
            else:
                callee = chain[j + 1]
                path, line = self._file(callee["call_file"]), callee["call_line"]
            frames.append(
                DsymLocation(
                    path=path,
                    instr_addr=addr,
                    lang=sym.get("lang", ""),
                    line=line,
                    sym_addr=sym["sym_addr"],
                    symbol=rec["name"],
                )
            )
        frames.append(
            DsymLocation(
                path=self._file(chain[0]["call_file"]),
                instr_addr=addr,
                lang=sym.get("lang", ""),
                line=chain[0]["call_line"],
                sym_addr=sym["sym_addr"],
                symbol=sym.get("symbol", ""),
            )
        )
        return frames


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


def parse_dwarf_debug_info(
    info: bytes, abbrev: bytes, debug_str: bytes = b""
) -> list[dict]:
    """Decode real DWARF v2-v4 ``.debug_info`` against its
    ``.debug_abbrev`` table into the inline-chain records a symbolicator
    needs: one dict per ``DW_TAG_inlined_subroutine`` —
    ``{low, high, name, call_file, call_line, depth}`` (depth 1 =
    directly under its subprogram; call_file is a 1-based index into the
    unit's .debug_line file table).  The walk is form-driven (every
    DWARF v4 form is length-decoded so unknown attributes skip
    correctly) and names resolve through DW_AT_abstract_origin /
    DW_AT_specification references, the indirection real compilers emit
    for inline instances.  This plus parse_dwarf_debug_line is the
    symbolic-go layer of the reference (dsymprocessor/symbolicator.go:
    95-116)."""
    import struct

    def fail(why: str) -> SymbolicationError:
        return SymbolicationError(f"invalid dSYM archive: {why}")

    # ---- .debug_abbrev: code -> (tag, has_children, [(attr, form)]) ----
    def parse_abbrev_table(off: int) -> dict[int, tuple[int, bool, list]]:
        table: dict[int, tuple[int, bool, list]] = {}
        while off < len(abbrev):
            code, off = _read_uleb(abbrev, off)
            if code == 0:
                break
            tag, off = _read_uleb(abbrev, off)
            if off >= len(abbrev):
                raise fail("truncated .debug_abbrev")
            has_children = abbrev[off] != 0
            off += 1
            attrs = []
            while True:
                at, off = _read_uleb(abbrev, off)
                form, off = _read_uleb(abbrev, off)
                if at == 0 and form == 0:
                    break
                attrs.append((at, form))
            table[code] = (tag, has_children, attrs)
        return table

    def read_form(form: int, p: int, addr_size: int) -> tuple[object, int]:
        """Return (value, new_offset); value semantics depend on form."""
        if form == 0x01:  # addr
            v = int.from_bytes(info[p: p + addr_size], "little")
            return v, p + addr_size
        if form in (0x0B, 0x0C, 0x11):  # data1, flag, ref1
            return info[p], p + 1
        if form in (0x05, 0x12):  # data2, ref2
            return struct.unpack_from("<H", info, p)[0], p + 2
        if form in (0x06, 0x13, 0x0E, 0x10, 0x17):  # data4, ref4, strp, ref_addr, sec_offset
            return struct.unpack_from("<I", info, p)[0], p + 4
        if form in (0x07, 0x14, 0x20):  # data8, ref8, ref_sig8
            return struct.unpack_from("<Q", info, p)[0], p + 8
        if form == 0x08:  # string (inline)
            end = info.find(b"\x00", p)
            if end < 0:
                raise fail("unterminated DW_FORM_string")
            return info[p:end].decode("utf-8", "replace"), end + 1
        if form in (0x0F, 0x15):  # udata, ref_udata
            return _read_uleb(info, p)
        if form == 0x0D:  # sdata
            return _read_sleb(info, p)
        if form == 0x19:  # flag_present
            return 1, p
        if form == 0x03:  # block2
            n = struct.unpack_from("<H", info, p)[0]
            return info[p + 2: p + 2 + n], p + 2 + n
        if form == 0x04:  # block4
            n = struct.unpack_from("<I", info, p)[0]
            return info[p + 4: p + 4 + n], p + 4 + n
        if form == 0x0A:  # block1
            n = info[p]
            return info[p + 1: p + 1 + n], p + 1 + n
        if form in (0x09, 0x18):  # block, exprloc
            n, p = _read_uleb(info, p)
            return info[p: p + n], p + n
        if form == 0x16:  # indirect
            actual, p = _read_uleb(info, p)
            return read_form(actual, p, addr_size)
        raise fail(f"unsupported DWARF form 0x{form:02x}")

    _AT_NAME, _AT_LOW, _AT_HIGH = 0x03, 0x11, 0x12
    _AT_ORIGIN, _AT_SPEC = 0x31, 0x47
    _AT_CALL_FILE, _AT_CALL_LINE = 0x58, 0x59
    _TAG_INLINED = 0x1D

    records: list[dict] = []
    name_by_offset: dict[int, str] = {}
    origin_by_record: list[tuple[int, int | None]] = []  # (record idx, ref)

    off = 0
    while off < len(info):
        (unit_len,) = struct.unpack_from("<I", info, off)
        if unit_len == 0xFFFFFFFF:
            raise fail("64-bit DWARF .debug_info units are not supported")
        unit_start, unit_end = off, off + 4 + unit_len
        if unit_end > len(info):
            raise fail(".debug_info unit overruns section")
        p = off + 4
        version, abbrev_off = struct.unpack_from("<HI", info, p)
        if version < 2 or version > 4:
            raise fail(f"unsupported .debug_info version {version}")
        addr_size = info[p + 6]
        p += 7
        table = parse_abbrev_table(abbrev_off)
        depth_stack: list[int] = []  # has_children nesting; tag per level
        inline_depth = 0
        while p < unit_end:
            die_off = p - unit_start  # CU-relative, the ref4 base
            code, p = _read_uleb(info, p)
            if code == 0:
                if depth_stack:
                    if depth_stack.pop() == _TAG_INLINED:
                        inline_depth -= 1
                continue
            entry = table.get(code)
            if entry is None:
                raise fail(f"abbrev code {code} not in .debug_abbrev")
            tag, has_children, attrs = entry
            vals: dict[int, object] = {}
            for at, form in attrs:
                v, p = read_form(form, p, addr_size)
                vals[at] = v
            name = vals.get(_AT_NAME)
            if isinstance(name, int):  # strp into .debug_str
                end = debug_str.find(b"\x00", name)
                name = debug_str[name:end].decode("utf-8", "replace") if end >= 0 else None
            if isinstance(name, str):
                name_by_offset[die_off] = name
            if tag == _TAG_INLINED:
                inline_depth += 1
                low = vals.get(_AT_LOW)
                high = vals.get(_AT_HIGH)
                # DWARF4 allows high_pc as an offset (constant class)
                if isinstance(high, int) and isinstance(low, int) and high < low:
                    high = low + high
                ref = vals.get(_AT_ORIGIN, vals.get(_AT_SPEC))
                records.append(
                    {
                        "low": low if isinstance(low, int) else 0,
                        "high": high if isinstance(high, int) else 0,
                        "name": name if isinstance(name, str) else None,
                        "call_file": int(vals.get(_AT_CALL_FILE, 0) or 0),
                        "call_line": int(vals.get(_AT_CALL_LINE, 0) or 0),
                        "depth": inline_depth,
                    }
                )
                origin_by_record.append(
                    (len(records) - 1, ref if isinstance(ref, int) else None)
                )
                if not has_children:
                    inline_depth -= 1
            if has_children:
                depth_stack.append(tag)
        off = unit_end

    for idx, ref in origin_by_record:
        if records[idx]["name"] is None and ref is not None:
            records[idx]["name"] = name_by_offset.get(ref, "")
        if records[idx]["name"] is None:
            records[idx]["name"] = ""
    return records


def parse_dwarf_line_table(
    section: bytes,
) -> "tuple[list[tuple[int, str | None, int]], list[str]]":
    """parse_dwarf_debug_line plus the FIRST unit's file-name table
    (what DW_AT_call_file indexes, 1-based)."""
    rows, files = _parse_debug_line_impl(section)
    return rows, files


def parse_dwarf_debug_line(section: bytes) -> "list[tuple[int, str | None, int]]":
    rows, _ = _parse_debug_line_impl(section)
    return rows


def _parse_debug_line_impl(
    section: bytes,
) -> "tuple[list[tuple[int, str | None, int]], list[str]]":
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
    first_files: list[str] | None = None
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

        if first_files is None:
            first_files = files

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
    return rows, first_files or []


def parse_macho_symtab(data: bytes) -> tuple[str, list[dict]]:
    """Back-compat symtab-only view of parse_macho_archive."""
    debug_id, symbols, _ = parse_macho_archive(data)
    return debug_id, symbols


def parse_macho_archive(
    data: bytes,
) -> "tuple[str, list[dict], DwarfData | None]":
    """Parse a real Mach-O 64-bit (little-endian) binary's LC_UUID +
    LC_SYMTAB into (debug_id, sorted symbol dicts) — the genuine binary
    format inside a dSYM bundle's ``Contents/Resources/DWARF/<binary>``.
    The reference reads these via Sentry's ``symbolic``
    (dsymprocessor/symbolicator.go:92-104); this is the from-scratch
    equivalent for the address->symbol layer: nlist_64 records filtered
    to defined non-debug section symbols (N_SECT, not N_STAB), names
    from the string table, each symbol's end = the next symbol's start
    (the standard symbolicator convention; the last symbol is
    unbounded).  When the binary carries ``__DWARF`` sections
    (LC_SEGMENT_64 walk), the REAL DWARF payload is decoded and returned
    as a DwarfData third element: the ``__debug_line`` line-number
    program (parse_dwarf_debug_line) for addr->(file,line), and — when
    ``__debug_info``/``__debug_abbrev`` are present — the inline-chain
    records (parse_dwarf_debug_info).  Symtab-only binaries return None
    and their lookups carry symbol + sym_addr with empty path/line.

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
    dwarf_sections: dict[str, tuple[int, int]] = {}
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
                if segname == b"__DWARF" and sectname.startswith(b"__debug_"):
                    size, offset = struct.unpack_from("<QI", data, so + 40)
                    if offset + size > len(data):
                        raise fail(f"{sectname.decode()} section overruns file")
                    dwarf_sections[sectname.decode()] = (offset, size)
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
    dwarf = None
    if "__debug_line" in dwarf_sections:
        def sect(name: str) -> bytes:
            o, n = dwarf_sections[name]
            return data[o: o + n]

        rows, files = parse_dwarf_line_table(sect("__debug_line"))
        inlines: list[dict] = []
        if "__debug_info" in dwarf_sections and "__debug_abbrev" in dwarf_sections:
            inlines = parse_dwarf_debug_info(
                sect("__debug_info"),
                sect("__debug_abbrev"),
                sect("__debug_str") if "__debug_str" in dwarf_sections else b"",
            )
        dwarf = DwarfData(line_rows=rows, files=files, inlines=inlines)
    return uuid_str, symbols, dwarf


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
            debug_id, symbols, dwarf = parse_macho_archive(bytes(data))
            self.sym_caches: dict[str, SymCache] = {
                debug_id.lower(): SymCache(symbols, dwarf=dwarf)
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
