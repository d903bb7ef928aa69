"""dSYM symbolicator + processor tests, mirroring
dsymprocessor/symbolicator_test.go and logs_processor_test.go (fake
symbolicator keyed to one UUID; golden full-stack strings for the
generic route and both MetricKit JSON shapes)."""

from __future__ import annotations

import json

import pytest

from opentelemetry_collector_symbolicator_ray.config import DsymConfig
from opentelemetry_collector_symbolicator_ray.errors import (
    ERR_FAILED_TO_FIND_DSYM,
    DsymFetchError,
    StoreError,
    SymbolicationError,
)
from opentelemetry_collector_symbolicator_ray.functions.dsymfile import DsymLocation
from opentelemetry_collector_symbolicator_ray.sources.stores import DsymStore
from opentelemetry_collector_symbolicator_ray.stages.dsym_processor import (
    DsymLogsProcessor,
    DsymSymbolicator,
    format_metrickit_stack_frames,
)
from opentelemetry_collector_symbolicator_ray.synth_artifacts import write_dsym

UUID = "6A8CB813-45F6-3652-AD33-778FD1EAB196"
BINARY = "Chateaux Bufeaux"


@pytest.fixture(scope="module")
def dsym_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dsyms")
    write_dsym(str(d), UUID, BINARY)
    return str(d)


def test_symbolicator_golden(dsym_dir):
    sym = DsymSymbolicator(DsymStore(dsym_dir))
    frame = {
        "binaryUUID": UUID,
        "offsetIntoBinaryTextSegment": 100436,
        "binaryName": "chateaux-bufeaux",
    }
    locations = sym.symbolicate_frame(UUID, BINARY, 100436)
    line = format_metrickit_stack_frames(frame, locations)
    # Mirrors dsymprocessor/symbolicator_test.go:41 with our synthetic
    # symbol table's path; 0x18854 == 100436, sym_addr 100372.
    assert line == (
        "chateaux-bufeaux\t\t\t0x18854 main "
        "(/src/Chateaux Bufeaux/Chateaux_BufeauxApp.swift:0) + 100372"
    )

    # UUID doesn't exist -> FetchError carrying the dsym-missing sentinel.
    with pytest.raises(DsymFetchError) as ei:
        sym.symbolicate_frame("2DBDCA05-2BAA-3BFE-9EF3-15A157D84058", BINARY, 100436)
    assert ei.value.dsym_missing
    assert "failed to fetch dSYM for 2DBDCA05-2BAA-3BFE-9EF3-15A157D84058" in str(ei.value)
    assert ERR_FAILED_TO_FIND_DSYM in str(ei.value)

    # binary doesn't exist in the store
    with pytest.raises(DsymFetchError):
        sym.symbolicate_frame(UUID, "other binary", 100436)

    # nothing at that offset
    with pytest.raises(SymbolicationError, match="could not find symbol at location 9999999999"):
        sym.symbolicate_frame(UUID, BINARY, 9999999999)

    assert len(sym.cache) == 1  # only the successful fetch is cached


def test_symbolicator_inline_expansion(dsym_dir):
    sym = DsymSymbolicator(DsymStore(dsym_dir))
    locations = sym.symbolicate_frame(UUID, BINARY, 101500)
    assert [loc.symbol for loc in locations] == ["drawFrame", "render"]


# ---------- processor with fake symbolicator ----------

class FakeDsymSymbolicator:
    """Mirror of logs_processor_test.go:48-61: known UUID returns one
    'main' frame; anything else raises the bare dsym-missing sentinel."""

    def __init__(self):
        self.calls = 0

    def symbolicate_frame(self, debug_id, binary_name, addr):
        self.calls += 1
        if debug_id != UUID:
            raise StoreError(ERR_FAILED_TO_FIND_DSYM, dsym_missing=True)
        return [
            DsymLocation(
                path="MyFile.swift", instr_addr=1, lang="swift", line=1, sym_addr=1, symbol="main"
            )
        ]


STACKTRACE = """0   CoreFoundation                      0x00000001835df228 7821F73C-378B-3A10-BE90-EF526B7DBA93 + 1155624
1   libobjc.A.dylib                     0x0000000180a79abc objc_exception_throw + 88
2   CoreFoundation                      0x00000001835e15fc 7821F73C-378B-3A10-BE90-EF526B7DBA93 + 1164796
3   Chateaux Bufeaux                    0x00000001025a0758 Chateaux Bufeaux + 231256
4   Chateaux Bufeaux                    0x00000001025a0834 Chateaux Bufeaux + 231476
5   Chateaux Bufeaux                    0x000000010259f2ac Chateaux Bufeaux + 225964
6   Chateaux Bufeaux                    0x0000000102577fd1 Chateaux Bufeaux + 65489
7   libswift_Concurrency.dylib          0x000000018f0a9241 DCB9E73A-92BA-3782-BC6D-3E1906622689 + 414273"""

EXPECTED = """0   CoreFoundation                      0x00000001835df228 7821F73C-378B-3A10-BE90-EF526B7DBA93 + 1155624
1   libobjc.A.dylib                     0x0000000180a79abc objc_exception_throw + 88
2   CoreFoundation                      0x00000001835e15fc 7821F73C-378B-3A10-BE90-EF526B7DBA93 + 1164796
3   Chateaux Bufeaux                    0x00000001025a0758 main (in Chateaux Bufeaux) (MyFile.swift:1) + 231256
4   Chateaux Bufeaux                    0x00000001025a0834 main (in Chateaux Bufeaux) (MyFile.swift:1) + 231476
5   Chateaux Bufeaux                    0x000000010259f2ac main (in Chateaux Bufeaux) (MyFile.swift:1) + 225964
6   Chateaux Bufeaux                    0x0000000102577fd1 main (in Chateaux Bufeaux) (MyFile.swift:1) + 65489
7   libswift_Concurrency.dylib          0x000000018f0a9241 DCB9E73A-92BA-3782-BC6D-3E1906622689 + 414273"""


@pytest.mark.parametrize("preserve", [True, False])
def test_generic_route_golden(preserve):
    proc = DsymLogsProcessor(
        cfg=DsymConfig(preserve_stack_trace=preserve), symbolicator=FakeDsymSymbolicator()
    )
    cfg = proc.cfg
    attrs = {cfg.stack_trace_attribute_key: STACKTRACE}
    resource = {
        cfg.build_uuid_attribute_key: UUID,
        cfg.app_executable_attribute_key: BINARY,
    }
    assert proc.process_record("error", attrs, resource)
    assert attrs[cfg.stack_trace_attribute_key] == EXPECTED
    assert attrs["honeycomb.processor_type"] == "dsym_symbolicator"
    assert attrs["honeycomb.processor_version"] == "1.0.2"
    # Unknown-binary frames left unchanged carry NO failure (bare
    # dsym-missing sentinel is not a FetchError in the fake).
    assert attrs[cfg.symbolicator_failure_attribute_key] is False
    if preserve:
        assert attrs[cfg.original_stack_trace_attribute_key] == STACKTRACE
    else:
        assert cfg.original_stack_trace_attribute_key not in attrs


def test_generic_route_missing_resource_attrs():
    proc = DsymLogsProcessor(cfg=DsymConfig(), symbolicator=FakeDsymSymbolicator())
    cfg = proc.cfg
    attrs = {cfg.stack_trace_attribute_key: STACKTRACE}
    assert proc.process_record("error", attrs, {})
    assert attrs[cfg.symbolicator_failure_attribute_key] is True
    assert attrs["exception.symbolicator.error"] == "missing attribute: app.debug.build_uuid"

    attrs2 = {cfg.stack_trace_attribute_key: STACKTRACE}
    assert proc.process_record("error", attrs2, {cfg.build_uuid_attribute_key: UUID})
    assert attrs2["exception.symbolicator.error"] == "missing attribute: app.bundle.executable"


APPLE_METRICKIT_JSON = json.dumps(
    {
        "callStacks": [
            {
                "threadAttributed": True,
                "callStackRootFrames": [
                    {
                        "binaryUUID": "6527276E-A3D1-30FB-BA68-ACA33324D618",
                        "offsetIntoBinaryTextSegment": 933484,
                        "binaryName": "SwiftUI",
                        "subFrames": [
                            {
                                "binaryUUID": "6527276E-A3D1-30FB-BA68-ACA33324D618",
                                "offsetIntoBinaryTextSegment": 933200,
                                "binaryName": "SwiftUI",
                                "subFrames": [
                                    {
                                        "binaryUUID": UUID,
                                        "offsetIntoBinaryTextSegment": 100436,
                                        "binaryName": BINARY,
                                        "subFrames": [
                                            {
                                                "binaryUUID": "189FE480-5D5B-3B89-9289-58BC88624420",
                                                "offsetIntoBinaryTextSegment": 68312,
                                                "binaryName": "dyld",
                                            }
                                        ],
                                    }
                                ],
                            }
                        ],
                    }
                ],
            }
        ]
    }
)

OTEL_METRICKIT_JSON = json.dumps(
    {
        "callStacks": [
            {
                "threadAttributed": True,
                "callStackFrames": [
                    {
                        "binaryUUID": "6527276E-A3D1-30FB-BA68-ACA33324D618",
                        "offsetAddress": 933484,
                        "binaryName": "SwiftUI",
                    },
                    {
                        "binaryUUID": "6527276E-A3D1-30FB-BA68-ACA33324D618",
                        "offsetAddress": 933200,
                        "binaryName": "SwiftUI",
                    },
                    {
                        "binaryUUID": UUID,
                        "offsetAddress": 100436,
                        "binaryName": BINARY,
                    },
                    {
                        "binaryUUID": "189FE480-5D5B-3B89-9289-58BC88624420",
                        "offsetAddress": 68312,
                        "binaryName": "dyld",
                    },
                ],
            }
        ]
    }
)

EXPECTED_METRICKIT = (
    "SwiftUI(6527276E-A3D1-30FB-BA68-ACA33324D618) +933484\n"
    "    SwiftUI(6527276E-A3D1-30FB-BA68-ACA33324D618) +933200\n"
    "    Chateaux Bufeaux\t\t\t0x18854 main (MyFile.swift:1) + 1\n"
    "    dyld(189FE480-5D5B-3B89-9289-58BC88624420) +68312"
)


@pytest.mark.parametrize("jsonstr", [APPLE_METRICKIT_JSON, OTEL_METRICKIT_JSON],
                         ids=["apple-recursive", "otel-flat"])
@pytest.mark.parametrize("preserve", [True, False])
def test_metrickit_route_golden(jsonstr, preserve):
    proc = DsymLogsProcessor(
        cfg=DsymConfig(preserve_stack_trace=preserve), symbolicator=FakeDsymSymbolicator()
    )
    cfg = proc.cfg
    attrs = {cfg.metrickit_stack_trace_attribute_key: jsonstr}
    assert proc.process_record("metrickit.diagnostic.crash", attrs, {})
    assert attrs[cfg.output_metrickit_stack_trace_attribute_key] == EXPECTED_METRICKIT
    assert attrs[cfg.symbolicator_failure_attribute_key] is False
    assert "exception.symbolicator.error" not in attrs
    if preserve:
        assert attrs[cfg.metrickit_stack_trace_attribute_key] == jsonstr
    else:
        assert cfg.metrickit_stack_trace_attribute_key not in attrs
    assert attrs[cfg.output_metrickit_exception_type_attribute_key] == "Unknown Error"
    assert attrs[cfg.output_metrickit_exception_message_attribute_key] == "Unknown Error"


def test_metrickit_dispatch_via_event_name():
    """exception.stacktrace attr + metrickit.diagnostic.* eventName goes
    down the MetricKit route (logs_processor.go:100-110)."""
    proc = DsymLogsProcessor(cfg=DsymConfig(), symbolicator=FakeDsymSymbolicator())
    cfg = proc.cfg
    attrs = {
        cfg.stack_trace_attribute_key: "whatever",
        cfg.metrickit_stack_trace_attribute_key: OTEL_METRICKIT_JSON,
    }
    assert proc.process_record("metrickit.diagnostic.crash", attrs, {})
    assert attrs[cfg.output_metrickit_stack_trace_attribute_key] == EXPECTED_METRICKIT


def test_metrickit_exception_attr_fallbacks():
    proc = DsymLogsProcessor(cfg=DsymConfig(), symbolicator=FakeDsymSymbolicator())
    cfg = proc.cfg
    attrs = {
        cfg.metrickit_stack_trace_attribute_key: '{ "callStacks": [] }',
        "metrickit.diagnostic.crash.exception.signal.name": "SIGSEGV",
        "metrickit.diagnostic.crash.exception.termination_reason": "Segfault",
    }
    assert proc.process_record("metrickit.diagnostic.crash", attrs, {})
    assert attrs[cfg.output_metrickit_exception_type_attribute_key] == "SIGSEGV"
    assert attrs[cfg.output_metrickit_exception_message_attribute_key] == "Segfault"
    assert attrs[cfg.output_metrickit_stack_trace_attribute_key] == ""


def test_metrickit_invalid_json():
    proc = DsymLogsProcessor(cfg=DsymConfig(), symbolicator=FakeDsymSymbolicator())
    cfg = proc.cfg
    attrs = {cfg.metrickit_stack_trace_attribute_key: "not json"}
    assert proc.process_record("metrickit.diagnostic.crash", attrs, {})
    assert attrs[cfg.symbolicator_failure_attribute_key] is True
    assert cfg.output_metrickit_stack_trace_attribute_key not in attrs or (
        cfg.output_metrickit_stack_trace_attribute_key == cfg.stack_trace_attribute_key
    )


def test_no_attrs_not_processed():
    proc = DsymLogsProcessor(cfg=DsymConfig(), symbolicator=FakeDsymSymbolicator())
    attrs = {"foo": "bar"}
    assert not proc.process_record("error", attrs, {})
    assert attrs == {"foo": "bar"}


def test_language_gate_skips():
    proc = DsymLogsProcessor(
        cfg=DsymConfig(allowed_languages=["swift"]), symbolicator=FakeDsymSymbolicator()
    )
    cfg = proc.cfg
    attrs = {cfg.stack_trace_attribute_key: STACKTRACE, cfg.language_attribute_key: "webjs"}
    assert not proc.process_record("error", attrs, {})
    attrs2 = {cfg.stack_trace_attribute_key: STACKTRACE}
    resource = {
        cfg.language_attribute_key: "Swift",
        cfg.build_uuid_attribute_key: UUID,
        cfg.app_executable_attribute_key: BINARY,
    }
    assert proc.process_record("error", attrs2, resource)


def test_cached_fetch_error_marks_failure_on_repeat(dsym_dir):
    """With the real symbolizer, a store miss is a cacheable FetchError:
    the FIRST frame with a missing uuid is left unchanged (dsym-missing
    sentinel), subsequent frames with the same uuid hit the per-record
    cache and mark the record failed (logs_processor.go:241-243 quirk)."""
    proc = DsymLogsProcessor(
        cfg=DsymConfig(), symbolicator=DsymSymbolicator(DsymStore(dsym_dir))
    )
    cfg = proc.cfg
    stack = (
        "0   Lib                      0x0000000000000001 2DBDCA05-2BAA-3BFE-9EF3-15A157D84058 + 10\n"
        "1   Lib                      0x0000000000000002 2DBDCA05-2BAA-3BFE-9EF3-15A157D84058 + 20"
    )
    attrs = {cfg.stack_trace_attribute_key: stack}
    resource = {
        cfg.build_uuid_attribute_key: UUID,
        cfg.app_executable_attribute_key: BINARY,
    }
    assert proc.process_record("error", attrs, resource)
    assert attrs[cfg.symbolicator_failure_attribute_key] is True
    # both lines remain unchanged
    assert attrs[cfg.stack_trace_attribute_key] == stack


class CountingFetchErrorSymbolicator:
    """Always raises a cacheable FetchError (non-dsym-missing 404)."""

    def __init__(self):
        self.calls = 0

    def symbolicate_frame(self, debug_id, binary_name, addr):
        self.calls += 1
        raise DsymFetchError(debug_id, SymbolicationError("404 not found"))


def test_error_caching_generic_stack_trace():
    """1 symbolicator call for 10 lines sharing a missing artifact
    (dsymprocessor/logs_processor_test.go TestErrorCaching_GenericStackTrace)."""
    sym = CountingFetchErrorSymbolicator()
    proc = DsymLogsProcessor(cfg=DsymConfig(), symbolicator=sym)
    cfg = proc.cfg
    lines = "\n".join(
        f"{i}   {BINARY}{' ' * 21}0x00000001025a07{i:02x} {BINARY} + {1000 + i}"
        for i in range(10)
    )
    attrs = {cfg.stack_trace_attribute_key: lines}
    resource = {
        cfg.build_uuid_attribute_key: UUID,
        cfg.app_executable_attribute_key: BINARY,
    }
    assert proc.process_record("error", attrs, resource)
    assert sym.calls == 1
    assert attrs[cfg.symbolicator_failure_attribute_key] is True
    # all lines kept unchanged
    assert attrs[cfg.stack_trace_attribute_key] == lines


def test_error_caching_metrickit():
    """MetricKit route: a cacheable FetchError aborts the record after a
    single call (dsymprocessor/logs_processor_test.go TestErrorCaching_MetricKit)."""
    sym = CountingFetchErrorSymbolicator()
    proc = DsymLogsProcessor(cfg=DsymConfig(), symbolicator=sym)
    cfg = proc.cfg
    report = {
        "callStacks": [
            {
                "threadAttributed": True,
                "callStackFrames": [
                    {"binaryUUID": UUID, "binaryName": BINARY, "offsetAddress": 100 + i}
                    for i in range(4)
                ],
            }
        ]
    }
    attrs = {cfg.metrickit_stack_trace_attribute_key: json.dumps(report)}
    assert proc.process_record("metrickit.diagnostic.crash", attrs, {})
    assert sym.calls == 1
    assert attrs[cfg.symbolicator_failure_attribute_key] is True
    assert cfg.output_metrickit_stack_trace_attribute_key not in attrs or (
        cfg.output_metrickit_stack_trace_attribute_key == cfg.stack_trace_attribute_key
        and cfg.stack_trace_attribute_key not in attrs
    )


# ---------------- real Mach-O symtab archives ----------------

MACHO_UUID = "6A8CB813-45F6-3652-AD33-778FD1EAB196"


def test_macho_symtab_roundtrip(tmp_path):
    """build_macho_symtab emits a structurally real Mach-O 64 binary
    (magic, LC_UUID, LC_SYMTAB, nlist_64, strtab) and
    parse_macho_symtab recovers the uuid and the sorted symbol table
    with next-start end addresses."""
    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        parse_macho_symtab,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        build_macho_symtab,
    )

    blob = build_macho_symtab(MACHO_UUID, [(100372, "main"), (4096, "start")])
    assert blob[:4] == b"\xcf\xfa\xed\xfe"
    uuid_str, symbols = parse_macho_symtab(blob)
    assert uuid_str == MACHO_UUID.lower()
    assert symbols == [
        {"sym_addr": 4096, "end": 100372, "symbol": "start"},
        {"sym_addr": 100372, "end": 1 << 63, "symbol": "main"},
    ]


def test_macho_backed_symbolication_end_to_end(tmp_path):
    """A DsymStore holding a REAL Mach-O binary resolves frames through
    the same DsymSymbolicator path as the JSON format: magic-sniffed in
    DsymArchive, golden address 100436 -> main/100372, below-range
    address fails with the reference's lookup error text."""
    from opentelemetry_collector_symbolicator_ray.errors import SymbolicationError
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        write_macho_dsym,
    )

    d = str(tmp_path / "machos")
    write_macho_dsym(d, MACHO_UUID, BINARY, [(100372, "main"), (4096, "start")])
    sym = DsymSymbolicator(DsymStore(d))
    locs = sym.symbolicate_frame(MACHO_UUID, BINARY, 100436)
    assert [(l.symbol, l.sym_addr, l.instr_addr) for l in locs] == [
        ("main", 100372, 100436)
    ]
    # Mach-O symtabs carry no DWARF line info
    assert locs[0].path == "" and locs[0].line == 0
    with pytest.raises(SymbolicationError, match="could not find symbol at location"):
        sym.symbolicate_frame(MACHO_UUID, BINARY, 100)


def test_macho_corruption_is_loud():
    from opentelemetry_collector_symbolicator_ray.errors import SymbolicationError
    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        DsymArchive,
        parse_macho_symtab,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        build_macho_symtab,
    )

    blob = build_macho_symtab(MACHO_UUID, [(4096, "start")])
    with pytest.raises(SymbolicationError, match="truncated Mach-O header"):
        parse_macho_symtab(blob[:16])
    with pytest.raises(SymbolicationError, match="overruns file"):
        parse_macho_symtab(blob[:-8])
    # non-Mach-O bytes still route to the JSON parser's error
    with pytest.raises(SymbolicationError, match="invalid dSYM archive"):
        DsymArchive(b"\x00\x01\x02\x03 not json")


def test_macho_symtab_lookup_query(ray_session):
    """The driver-registered sym_macho_symtab query: addresses derived
    from event_ids resolve through a REAL parsed Mach-O symtab binary.
    Pin the arithmetic: addr = 0x800 + (event_id % 512)*0x10; symbols
    func_i at 0x1000 + i*0x40, so addr < 0x1000 misses (null) and
    otherwise symbol index = (addr - 0x1000) >> 6."""
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        macho_symtab_lookup,
    )

    df = macho_symtab_lookup("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert df["debug_id"].nunique() == 1
    for _, row in df.head(600).iterrows():
        addr = 0x800 + (int(row["event_id"]) % 512) * 0x10
        assert int(row["instr_addr"]) == addr
        if addr < 0x1000:
            assert row["symbol"] is None or row["symbol"] != row["symbol"] or not isinstance(row["symbol"], str)
        else:
            # the LAST symtab symbol is unbounded (standard symbolicator
            # convention), so addresses past the table clamp to it
            i = min((addr - 0x1000) >> 6, 63)
            assert row["symbol"] == f"func_{i:03d}"
            assert int(row["sym_addr"]) == 0x1000 + i * 0x40


def test_macho_dwarf_line_roundtrip(tmp_path):
    """A Mach-O carrying a REAL DWARF v4 .debug_line section resolves
    addr -> (file, line) through the full line-number state machine:
    rows own [their addr, next row's addr); the end_sequence closes the
    final range."""
    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        DsymArchive,
        parse_macho_archive,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        build_macho_dwarf,
    )

    symbols = [(0x1000, "main"), (0x1100, "helper")]
    lines = [
        (0x1000, "app/main.c", 10),
        (0x1040, "app/main.c", 12),
        (0x1100, "app/util.c", 5),
    ]
    blob = build_macho_dwarf(MACHO_UUID, symbols, lines)
    uid, syms, dwarf = parse_macho_archive(blob)
    assert uid == MACHO_UUID.lower()
    assert [s["symbol"] for s in syms] == ["main", "helper"]
    assert dwarf.line_rows[:3] == [(0x1000, "app/main.c", 10), (0x1040, "app/main.c", 12), (0x1100, "app/util.c", 5)]
    assert dwarf.line_rows[-1][1] is None  # end_sequence closes the table
    assert dwarf.files == ["app/main.c", "app/util.c"]
    assert dwarf.inlines == []

    arc = DsymArchive(blob)
    loc = arc.lookup(MACHO_UUID, 0x1000)[-1]
    assert (loc.symbol, loc.path, loc.line) == ("main", "app/main.c", 10)
    loc = arc.lookup(MACHO_UUID, 0x103F)[-1]
    assert (loc.path, loc.line) == ("app/main.c", 10)
    loc = arc.lookup(MACHO_UUID, 0x1040)[-1]
    assert (loc.path, loc.line) == ("app/main.c", 12)
    loc = arc.lookup(MACHO_UUID, 0x1105)[-1]
    assert (loc.symbol, loc.path, loc.line) == ("helper", "app/util.c", 5)
    # past the end_sequence (0x1100 + 0x40): symbol still resolves
    # (unbounded last symtab entry) but the line table is closed
    loc = arc.lookup(MACHO_UUID, 0x1200)[-1]
    assert loc.symbol == "helper" and loc.path == "" and loc.line == 0


def test_macho_dwarf_end_to_end_store_lookup(tmp_path):
    """write_macho_dsym(lines=...) -> DsymStore -> symbolicate_frame
    carries DWARF file/line into the mapped frame."""
    from opentelemetry_collector_symbolicator_ray.sources.stores import DsymStore
    from opentelemetry_collector_symbolicator_ray.stages.dsym_processor import (
        DsymSymbolicator,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        write_macho_dsym,
    )

    d = str(tmp_path / "machos")
    write_macho_dsym(
        d, MACHO_UUID, BINARY,
        [(100372, "main")],
        lines=[(100372, "src/app.swift", 41), (100420, "src/app.swift", 44)],
    )
    sym = DsymSymbolicator(DsymStore(d))
    locs = sym.symbolicate_frame(MACHO_UUID, BINARY, 100436)
    assert [(l.symbol, l.path, l.line) for l in locs] == [("main", "src/app.swift", 44)]


def test_dwarf_special_opcodes_and_v2_header():
    """Hand-crafted DWARF v2 unit exercising special opcodes,
    DW_LNS_const_add_pc, DW_LNS_fixed_advance_pc and a directory-mapped
    file table — the opcodes real compilers emit that the synthetic
    builder does not."""
    import struct

    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        parse_dwarf_debug_line,
    )

    def uleb(n):
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | 0x80 if n else b)
            if not n:
                return bytes(out)

    post = struct.pack("<BBbBB", 1, 1, -5, 14, 13) + bytes(
        [0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 1]
    )
    post += b"src\x00\x00"
    post += b"a.c\x00" + uleb(1) + uleb(0) + uleb(0)
    post += b"\x00"
    prog = b"\x00" + uleb(9) + b"\x02" + struct.pack("<Q", 0x2000)
    prog += bytes([49])  # special: addr +2, line 1 + (-5 + 36%14) = 4
    prog += b"\x08"      # const_add_pc: addr += (255-13)//14 = 17
    prog += b"\x09" + struct.pack("<H", 0x10) + b"\x01"  # fixed_advance + copy
    prog += b"\x00" + uleb(1) + b"\x01"
    body = struct.pack("<HI", 2, len(post)) + post + prog
    unit = struct.pack("<I", len(body)) + body
    rows = parse_dwarf_debug_line(unit)
    assert rows == [
        (0x2002, "src/a.c", 4),
        (0x2002 + 17 + 0x10, "src/a.c", 4),
        (0x2002 + 17 + 0x10, None, 0),
    ]


def test_dwarf_corruption_is_loud():
    from opentelemetry_collector_symbolicator_ray.errors import SymbolicationError
    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        parse_dwarf_debug_line,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        build_dwarf_debug_line,
    )

    unit = build_dwarf_debug_line([(0x1000, "a.c", 1)])
    with pytest.raises(SymbolicationError, match="overruns section"):
        parse_dwarf_debug_line(unit[:-4])
    with pytest.raises(SymbolicationError, match="unsupported .debug_line version"):
        bad = bytearray(unit)
        bad[4] = 9  # version field
        parse_dwarf_debug_line(bytes(bad))
    # truncated Mach-O section bounds are caught at the archive layer
    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        parse_macho_archive,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        build_macho_dwarf,
    )

    blob = build_macho_dwarf(MACHO_UUID, [(0x1000, "f")], [(0x1000, "a.c", 1)])
    with pytest.raises(SymbolicationError, match="overruns"):
        parse_macho_archive(blob[:-10])


def test_macho_dwarf_inline_chain_roundtrip():
    """__debug_info/__debug_abbrev inline DIEs produce the standard
    DWARF inline unwinding: innermost frame = PC's line-table entry,
    each outer frame = the call site of the inline nested inside it,
    physical symtab frame last."""
    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        DsymArchive,
        parse_macho_archive,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        build_macho_dwarf,
    )

    symbols = [(0x1000, "main"), (0x1200, "other")]
    lines = [
        (0x1000, "main.c", 10),
        (0x1050, "inlined_a.h", 100),
        (0x1060, "inlined_b.h", 200),
        (0x1080, "main.c", 14),
    ]
    subprograms = [{
        "low": 0x1000, "high": 0x1200, "name": "main",
        "inlines": [{
            "low": 0x1050, "high": 0x1080, "name": "alpha",
            "call_file": 1, "call_line": 12,
            "inlines": [{
                "low": 0x1060, "high": 0x1070, "name": "beta",
                "call_file": 2, "call_line": 101,
            }],
        }],
    }]
    blob = build_macho_dwarf(MACHO_UUID, symbols, lines, subprograms=subprograms)
    _, _, dwarf = parse_macho_archive(blob)
    assert [r["name"] for r in dwarf.inlines] == ["alpha", "beta"]
    assert [r["depth"] for r in dwarf.inlines] == [1, 2]

    arc = DsymArchive(blob)
    assert [(l.symbol, l.path, l.line) for l in arc.lookup(MACHO_UUID, 0x1065)] == [
        ("beta", "inlined_b.h", 200),   # innermost: PC line entry
        ("alpha", "inlined_a.h", 101),  # beta's call site
        ("main", "main.c", 12),         # alpha's call site
    ]
    assert [(l.symbol, l.path, l.line) for l in arc.lookup(MACHO_UUID, 0x1055)] == [
        ("alpha", "inlined_a.h", 100),
        ("main", "main.c", 12),
    ]
    # outside any inline range: plain line-table resolution
    assert [(l.symbol, l.path, l.line) for l in arc.lookup(MACHO_UUID, 0x1090)] == [
        ("main", "main.c", 14),
    ]


def test_dwarf_debug_info_abstract_origin_name():
    """Hand-encoded .debug_info where the inline DIE carries no
    DW_AT_name, only DW_AT_abstract_origin (ref4) to a named subprogram
    DIE — the indirection real compilers emit for inline instances."""
    import struct

    from opentelemetry_collector_symbolicator_ray.functions.dsymfile import (
        parse_dwarf_debug_info,
    )

    def uleb(n):
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | 0x80 if n else b)
            if not n:
                return bytes(out)

    # abbrev 1: CU (children, no attrs); 2: subprogram (children, name
    # string); 3: inlined_subroutine (no children, abstract_origin ref4,
    # low/high addr, call_file/line udata)
    abbrev = bytearray()
    abbrev += uleb(1) + uleb(0x11) + b"\x01" + b"\x00\x00"
    abbrev += uleb(2) + uleb(0x2E) + b"\x01" + uleb(0x03) + uleb(0x08) + b"\x00\x00"
    abbrev += (uleb(3) + uleb(0x1D) + b"\x00"
               + uleb(0x31) + uleb(0x13)
               + uleb(0x11) + uleb(0x01) + uleb(0x12) + uleb(0x01)
               + uleb(0x58) + uleb(0x0F) + uleb(0x59) + uleb(0x0F)
               + b"\x00\x00")
    abbrev += b"\x00"

    body = bytearray()
    body += uleb(1)                      # CU DIE (no attrs)
    sp_off_holder = []
    sp_off_holder.append(4 + 7 + len(body))  # CU-relative offset of subprogram DIE
    body += uleb(2) + b"greek\x00"       # named abstract subprogram
    body += uleb(3)                      # inline referencing it
    body += struct.pack("<I", sp_off_holder[0])
    body += struct.pack("<QQ", 0x10, 0x20)
    body += uleb(1) + uleb(7)
    body += b"\x00"                      # end subprogram children
    body += b"\x00"                      # end CU children
    cu = struct.pack("<HIB", 4, 0, 8) + bytes(body)
    info = struct.pack("<I", len(cu)) + cu
    recs = parse_dwarf_debug_info(info, bytes(abbrev))
    assert recs == [
        {"low": 0x10, "high": 0x20, "name": "greek",
         "call_file": 1, "call_line": 7, "depth": 1}
    ]
