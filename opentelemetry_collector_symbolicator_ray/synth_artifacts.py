"""Deterministic debug-artifact fixture generators (FIXTURES.md §3).

Generates the side-input artifact trees consumed by the symbolizer
actors: JS sourcemap pairs (with decoy embedded ``sourceMappingURL``
strings so the resolver must take the LAST match, mirroring
/root/reference/test_assets/basic-mapping.js + store.go:58-65), ProGuard
``mapping.txt`` files (public R8 format), and synthetic dSYM symbol
tables laid out under the exact store key paths
(dsymprocessor/store.go:29, proguardprocessor/store.go:25-26).

Everything is seeded/deterministic; no external data.
"""

from __future__ import annotations

import json
import os

from .functions.sourcemap import encode_mappings


def write_js_sourcemap(dir_path: str, file_name: str, fn_a: str = "foo", fn_b: str = "bar") -> None:
    """Write <dir>/<file_name> and <dir>/<file_name>.map.

    The minified file carries two decoy Blob lines with embedded
    sourceMappingURL strings before the real trailing comment; the map
    reproduces the reference fixture's shape (two functions + two call
    sites, names [fn_a, fn_b]).  With the pinned lookup semantics
    (functions/sourcemap.py), any frame with column >= 1 resolves to the
    final token: (fn_b, <file_name>, line 8, col 1)."""
    os.makedirs(dir_path, exist_ok=True)

    minified = (
        f"function {fn_a}() {{ return 42 }} "
        f"function {fn_b}() {{ return 24 }} {fn_a}(); {fn_b}();"
    )
    decoy = (
        "var worker=new Blob(['function doWork(){};\\n"
        "//# sourceMappingURL=embedded-content.js.map\\n'],"
        '{type:"text/javascript;charset=utf-8"});'
    )
    source = "\n".join(
        [minified, decoy, decoy.replace("worker", "worker2"),
         f"//# sourceMappingURL={file_name}.map", ""]
    )

    brace_a = minified.index("{")
    def_b = minified.index(f"function {fn_b}")
    call_a = minified.index(f"{fn_a}();")
    call_b = minified.index(f"{fn_b}();")
    # (gen_line, gen_col, src_line, src_col, name_idx|None)
    tokens = [
        (0, 0, 0, 0, None),
        (0, 9, 0, 9, 0),
        (0, brace_a, 1, 2, None),
        (0, def_b, 3, 0, None),
        (0, def_b + 9, 3, 9, 1),
        (0, call_a, 6, 0, 0),
        (0, call_b, 7, 0, 1),
    ]
    source_map = {
        "version": 3,
        "names": [fn_a, fn_b],
        "sources": [file_name],
        "mappings": encode_mappings(tokens),
    }

    with open(os.path.join(dir_path, file_name), "w") as f:
        f.write(source)
    with open(os.path.join(dir_path, f"{file_name}.map"), "w") as f:
        json.dump(source_map, f)


def write_proguard_mapping(
    dir_path: str,
    uuid: str,
    *,
    app_class: str = "com.example.app.MainActivity",
    obf_class: str = "a.b.c",
    source_file: str = "MainActivity.java",
) -> None:
    """Write <dir>/<uuid>.txt in the public ProGuard/R8 mapping format,
    including an R8 sourceFile metadata comment and one inline (1->N)
    range so the expansion path (proguardprocessor/log_processor.go:
    295-304) is exercised."""
    os.makedirs(dir_path, exist_ok=True)
    lines = [
        f"{app_class} -> {obf_class}:",
        f'# {{"id":"sourceFile","fileName":"{source_file}"}}',
        "    int value -> b",
        f"    1:10:void onCreate(android.os.Bundle):40:49 -> a",
        # inline pair: helper() lines 7-8 inlined into onClick() at 90
        f"    11:12:void helper():7:8 -> d",
        f"    11:12:void onClick():90:90 -> d",
        f"    20:29:java.lang.String toString():100:109 -> e",
        # no-line-info method
        f"    void finish() -> f",
        f"com.example.app.Util -> a.b.d:",
        f'# {{"id":"sourceFile","fileName":"Util.java"}}',
        f"    5:15:int compute(int):200:210 -> a",
    ]
    with open(os.path.join(dir_path, f"{uuid}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def write_dsym(
    dir_path: str,
    debug_id: str,
    binary_name: str,
    symbols: list[dict] | None = None,
) -> None:
    """Write a synthetic dSYM under the reference's store key layout:
    <dir>/<debug_id>.dSYM/Contents/Resources/DWARF/<binary_name>.

    The reference's real DWARF blob is absent from its repo
    (.MISSING_LARGE_BLOBS), so the engine defines its archive format as a
    JSON symbol table: {"debug_id": ..., "symbols": [{"sym_addr", "end",
    "symbol", "path", "line", "lang", "inlines": [...]}]}, consumed by
    functions/dsymfile.py with bisect lookup.  The default table anchors
    the reference's integration golden
    (dsymprocessor/symbolicator_test.go:31-41): lookup(100436) ->
    symbol "main", sym_addr 100372 (0x18834), line 0."""
    dwarf_dir = os.path.join(
        dir_path, f"{debug_id}.dSYM", "Contents", "Resources", "DWARF"
    )
    os.makedirs(dwarf_dir, exist_ok=True)
    if symbols is None:
        symbols = [
            {
                "sym_addr": 4096,
                "end": 8192,
                "symbol": "start",
                "path": f"/src/{binary_name}/start.swift",
                "line": 12,
                "lang": "swift",
            },
            {
                "sym_addr": 100372,
                "end": 101000,
                "symbol": "main",
                "path": f"/src/{binary_name}/{binary_name.replace(' ', '_')}App.swift",
                "line": 0,
                "lang": "swift",
            },
            {
                "sym_addr": 101000,
                "end": 102000,
                "symbol": "render",
                "path": f"/src/{binary_name}/Render.swift",
                "line": 33,
                "lang": "swift",
                # inline chain: innermost first, like a DWARF inline expansion
                "inlines": [
                    {"symbol": "drawFrame", "path": f"/src/{binary_name}/Draw.swift", "line": 7},
                ],
            },
        ]
    payload = {"debug_id": debug_id.lower(), "symbols": symbols}
    with open(os.path.join(dwarf_dir, binary_name), "w") as f:
        json.dump(payload, f)


def build_macho_symtab(debug_id: str, symbols: list[tuple[int, str]]) -> bytes:
    """Assemble a REAL minimal Mach-O 64-bit little-endian binary
    (MH_MAGIC_64 header + LC_UUID + LC_SYMTAB + nlist_64 records +
    string table) — the genuine on-disk format of a dSYM bundle's
    DWARF/<binary> file at the symtab layer, parseable by
    functions/dsymfile.parse_macho_symtab AND by any standard Mach-O
    tool.  ``debug_id`` must be a UUID string (it becomes LC_UUID);
    ``symbols`` are (address, name) pairs."""
    import struct
    import uuid as uuid_mod

    uuid_bytes = uuid_mod.UUID(debug_id).bytes

    strtab = bytearray(b"\x00")  # index 0 is the traditional empty name
    nlists = bytearray()
    for addr, name in sorted(symbols):
        n_strx = len(strtab)
        strtab += name.encode("utf-8") + b"\x00"
        # n_type=N_SECT (defined in section), n_sect=1, n_desc=0
        nlists += struct.pack("<IBBHQ", n_strx, 0x0E, 1, 0, addr)

    lc_uuid = struct.pack("<II", 0x1B, 24) + uuid_bytes
    # header(32) + LC_UUID(24) + LC_SYMTAB(24)
    symoff = 32 + 24 + 24
    stroff = symoff + len(nlists)
    lc_symtab = struct.pack(
        "<IIIIII", 0x02, 24, symoff, len(symbols), stroff, len(strtab)
    )
    header = struct.pack(
        "<IiiIIII",
        0xFEEDFACF,        # MH_MAGIC_64
        0x0100000C,        # CPU_TYPE_ARM64
        0,                 # cpusubtype
        0xA,               # MH_DSYM
        2,                 # ncmds
        len(lc_uuid) + len(lc_symtab),
        0,                 # flags
    ) + struct.pack("<I", 0)  # reserved
    return bytes(header + lc_uuid + lc_symtab + nlists + strtab)


def _uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _sleb(n: int) -> bytes:
    out = bytearray()
    more = True
    while more:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not (b & 0x40)) or (n == -1 and (b & 0x40)):
            more = False
        else:
            b |= 0x80
        out.append(b)
    return bytes(out)


def build_dwarf_debug_line(lines: list[tuple[int, str, int]]) -> bytes:
    """Encode a REAL DWARF v4 ``.debug_line`` unit (the genuine on-disk
    format a dSYM's ``__DWARF,__debug_line`` section holds — the data
    the reference's symbolic-go reads for file/line resolution,
    dsymprocessor/symbolicator.go:95-104).  ``lines`` are sorted
    (address, path, line) rows; the unit uses the standard v4 header
    (line_base -5, line_range 14, opcode_base 13) and a single sequence
    of standard opcodes: DW_LNE_set_address, then per row
    DW_LNS_advance_pc / DW_LNS_set_file / DW_LNS_advance_line /
    DW_LNS_copy, closed by DW_LNE_end_sequence.  Decodable by any DWARF
    consumer (dwarfdump, llvm-dwarfdump, symbolic)."""
    import struct

    if not lines:
        raise ValueError("build_dwarf_debug_line requires at least one row")
    files: list[str] = []
    file_idx: dict[str, int] = {}
    for _, path, _ in lines:
        if path not in file_idx:
            files.append(path)
            file_idx[path] = len(files)  # DWARF file numbers are 1-based

    # header after header_length field: min_inst(1) max_ops(1)
    # default_is_stmt(1) line_base(-5) line_range(14) opcode_base(13)
    # + std opcode arg counts for opcodes 1..12 + dirs + file table
    post_len = bytearray()
    post_len += struct.pack("<BBBbBB", 1, 1, 1, -5, 14, 13)
    post_len += bytes([0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 1])
    post_len += b"\x00"  # empty include_directories
    for name in files:
        post_len += name.encode() + b"\x00" + _uleb(0) + _uleb(0) + _uleb(0)
    post_len += b"\x00"  # end of file table

    prog = bytearray()
    first_addr = lines[0][0]
    prog += b"\x00" + _uleb(9) + b"\x02" + struct.pack("<Q", first_addr)
    cur_addr, cur_file, cur_line = first_addr, 1, 1
    for addr, path, line in lines:
        if addr < cur_addr:
            raise ValueError("line rows must be sorted by address")
        if addr != cur_addr:
            prog += b"\x02" + _uleb(addr - cur_addr)  # DW_LNS_advance_pc
            cur_addr = addr
        fi = file_idx[path]
        if fi != cur_file:
            prog += b"\x04" + _uleb(fi)  # DW_LNS_set_file
            cur_file = fi
        if line != cur_line:
            prog += b"\x03" + _sleb(line - cur_line)  # DW_LNS_advance_line
            cur_line = line
        prog += b"\x01"  # DW_LNS_copy
    # advance past the final row so its range is non-empty, then close
    prog += b"\x02" + _uleb(0x40)
    prog += b"\x00" + _uleb(1) + b"\x01"  # DW_LNE_end_sequence

    body = struct.pack("<HI", 4, len(post_len)) + bytes(post_len) + bytes(prog)
    return struct.pack("<I", len(body)) + body


def build_dwarf_debug_info(
    subprograms: list[dict],
) -> tuple[bytes, bytes]:
    """Encode REAL DWARF v4 ``.debug_abbrev`` + ``.debug_info``
    sections describing subprograms with nested
    ``DW_TAG_inlined_subroutine`` DIEs — the data symbolic-go walks to
    produce inline frame chains (dsymprocessor/symbolicator.go:95-116,
    consumed 1->N at logs_processor.go:126-133).  ``subprograms`` is a
    list of dicts ``{low, high, name, inlines: [...]}​`` where each
    inline is ``{low, high, name, call_file, call_line, inlines: [...]}``
    (``call_file`` is a 1-based index into the unit's .debug_line file
    table).  Encoded with DW_FORM_string / DW_FORM_addr / DW_FORM_udata
    — decodable by any DWARF consumer."""
    import struct

    # abbrev 1: compile_unit (children), name
    # abbrev 2: subprogram (children), name, low_pc, high_pc
    # abbrev 3: inlined_subroutine (children), name, low_pc, high_pc,
    #           call_file, call_line
    abbrev = bytearray()
    abbrev += _uleb(1) + _uleb(0x11) + b"\x01"
    abbrev += _uleb(0x03) + _uleb(0x08)
    abbrev += b"\x00\x00"
    abbrev += _uleb(2) + _uleb(0x2E) + b"\x01"
    abbrev += _uleb(0x03) + _uleb(0x08)
    abbrev += _uleb(0x11) + _uleb(0x01)
    abbrev += _uleb(0x12) + _uleb(0x01)
    abbrev += b"\x00\x00"
    abbrev += _uleb(3) + _uleb(0x1D) + b"\x01"
    abbrev += _uleb(0x03) + _uleb(0x08)
    abbrev += _uleb(0x11) + _uleb(0x01)
    abbrev += _uleb(0x12) + _uleb(0x01)
    abbrev += _uleb(0x58) + _uleb(0x0F)
    abbrev += _uleb(0x59) + _uleb(0x0F)
    abbrev += b"\x00\x00"
    abbrev += b"\x00"  # end of abbrev table

    def emit_inline(die: dict) -> bytes:
        out = bytearray()
        out += _uleb(3)
        out += die["name"].encode() + b"\x00"
        out += struct.pack("<Q", die["low"]) + struct.pack("<Q", die["high"])
        out += _uleb(die["call_file"]) + _uleb(die["call_line"])
        for child in die.get("inlines", []):
            out += emit_inline(child)
        out += b"\x00"  # end of children
        return bytes(out)

    body = bytearray()
    body += _uleb(1) + b"synth.c\x00"  # compile_unit
    for sp in subprograms:
        body += _uleb(2)
        body += sp["name"].encode() + b"\x00"
        body += struct.pack("<Q", sp["low"]) + struct.pack("<Q", sp["high"])
        for die in sp.get("inlines", []):
            body += emit_inline(die)
        body += b"\x00"
    body += b"\x00"  # end of compile_unit children

    cu = struct.pack("<HIB", 4, 0, 8) + bytes(body)
    info = struct.pack("<I", len(cu)) + cu
    return bytes(abbrev), info


def build_macho_dwarf(
    debug_id: str,
    symbols: list[tuple[int, str]],
    lines: list[tuple[int, str, int]],
    subprograms: list[dict] | None = None,
) -> bytes:
    """Assemble a real Mach-O 64 binary like build_macho_symtab but with
    a third load command: an LC_SEGMENT_64 ``__DWARF`` segment holding a
    genuine ``__debug_line`` section (build_dwarf_debug_line) and — when
    ``subprograms`` carry inline DIEs — ``__debug_abbrev`` +
    ``__debug_info`` (build_dwarf_debug_info) — the full structural
    shape of a dSYM bundle's DWARF/<binary> file, giving
    address->file/line and inline-chain resolution on top of the
    symtab's address->symbol."""
    import struct
    import uuid as uuid_mod

    uuid_bytes = uuid_mod.UUID(debug_id).bytes

    strtab = bytearray(b"\x00")
    nlists = bytearray()
    for addr, name in sorted(symbols):
        n_strx = len(strtab)
        strtab += name.encode("utf-8") + b"\x00"
        nlists += struct.pack("<IBBHQ", n_strx, 0x0E, 1, 0, addr)

    sections: list[tuple[bytes, bytes]] = [
        (b"__debug_line", build_dwarf_debug_line(lines))
    ]
    if subprograms:
        abbrev, info = build_dwarf_debug_info(subprograms)
        sections.append((b"__debug_abbrev", abbrev))
        sections.append((b"__debug_info", info))

    lc_uuid_sz, lc_symtab_sz = 24, 24
    lc_seg_sz = 72 + 80 * len(sections)
    header_sz = 32
    symoff = header_sz + lc_uuid_sz + lc_symtab_sz + lc_seg_sz
    stroff = symoff + len(nlists)
    data_off = stroff + len(strtab)

    lc_uuid = struct.pack("<II", 0x1B, lc_uuid_sz) + uuid_bytes
    lc_symtab = struct.pack(
        "<IIIIII", 0x02, lc_symtab_sz, symoff, len(symbols), stroff, len(strtab)
    )
    total_size = sum(len(payload) for _, payload in sections)
    seg = struct.pack(
        "<II16sQQQQiiII",
        0x19, lc_seg_sz, b"__DWARF",
        0, total_size,               # vmaddr, vmsize
        data_off, total_size,        # fileoff, filesize
        7, 3,                        # maxprot, initprot
        len(sections), 0,            # nsects, flags
    )
    sects = bytearray()
    payloads = bytearray()
    off = data_off
    for sectname, payload in sections:
        sects += struct.pack(
            "<16s16sQQIIIIIIII",
            sectname, b"__DWARF",
            0, len(payload), off,
            0, 0, 0, 0, 0, 0, 0,
        )
        payloads += payload
        off += len(payload)
    header = struct.pack(
        "<IiiIIII",
        0xFEEDFACF, 0x0100000C, 0, 0xA,
        3, lc_uuid_sz + lc_symtab_sz + lc_seg_sz, 0,
    ) + struct.pack("<I", 0)
    return bytes(
        header + lc_uuid + lc_symtab + seg + bytes(sects)
        + nlists + strtab + bytes(payloads)
    )


def write_macho_dsym(
    dir_path: str,
    debug_id: str,
    binary_name: str,
    symbols: list[tuple[int, str]],
    lines: list[tuple[int, str, int]] | None = None,
) -> None:
    """Write a real Mach-O dSYM (symtab-only, or symtab + DWARF
    .debug_line when ``lines`` is given) under the reference's store key
    layout <dir>/<debug_id>.dSYM/Contents/Resources/DWARF/<binary>."""
    dwarf_dir = os.path.join(
        dir_path, f"{debug_id}.dSYM", "Contents", "Resources", "DWARF"
    )
    os.makedirs(dwarf_dir, exist_ok=True)
    blob = (
        build_macho_dwarf(debug_id, symbols, lines)
        if lines
        else build_macho_symtab(debug_id, symbols)
    )
    with open(os.path.join(dwarf_dir, binary_name), "wb") as f:
        f.write(blob)
