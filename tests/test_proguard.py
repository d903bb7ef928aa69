"""Java parser corpus (proguardprocessor/stack_trace_parser_test.go),
ProGuard mapper semantics, and proguard processor operator tests
(proguardprocessor/log_processor_test.go patterns)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_symbolicator_ray.config import ProguardConfig
from opentelemetry_collector_symbolicator_ray.errors import (
    ProguardFetchError,
    SymbolicationError,
)
from opentelemetry_collector_symbolicator_ray.functions.java_stack_parser import (
    ERR_EMPTY_STACK_TRACE,
    ERR_INVALID_STACK_TRACE,
    ERR_NO_FRAMES_PARSED,
    JavaParseError,
    parse_stack_frame,
    parse_stack_trace,
)
from opentelemetry_collector_symbolicator_ray.functions.proguard import (
    ProguardMapper,
    RemappedJavaFrame,
)
from opentelemetry_collector_symbolicator_ray.sources.stores import ProguardStore
from opentelemetry_collector_symbolicator_ray.stages.proguard_processor import (
    ProguardLogProcessor,
    ProguardSymbolicator,
)
from opentelemetry_collector_symbolicator_ray.synth_artifacts import write_proguard_mapping

MAX_U32 = 4294967295
UUID = "f63db37d-9886-452a-8e56-2250dcc20103"


# ---------- parser corpus ----------

def FR(cls, method, src, line):
    return ("frame", cls, method, src, line)


def RAW(line):
    return ("raw", line)


PARSE_CASES = [
    (
        "Standard Java stack trace",
        "java.lang.RuntimeException: Something went wrong\n"
        "\tat com.example.MyClass.myMethod(MyClass.java:123)\n"
        "\tat com.example.AnotherClass.anotherMethod(AnotherClass.java:456)",
        "java.lang.RuntimeException", "Something went wrong",
        [FR("com.example.MyClass", "myMethod", "MyClass.java", 123),
         FR("com.example.AnotherClass", "anotherMethod", "AnotherClass.java", 456)],
        None,
    ),
    (
        "Native Method",
        "java.lang.NullPointerException: Null value\n"
        "\tat com.example.MyClass.method1(MyClass.java:100)\n"
        "\tat com.example.NativeClass.nativeMethod(Native Method)\n"
        "\tat com.example.MyClass.method2(MyClass.java:200)",
        "java.lang.NullPointerException", "Null value",
        [FR("com.example.MyClass", "method1", "MyClass.java", 100),
         FR("com.example.NativeClass", "nativeMethod", "Native Method", -2),
         FR("com.example.MyClass", "method2", "MyClass.java", 200)],
        None,
    ),
    (
        "Unknown Source",
        "java.io.IOException: IO error\n"
        "\tat com.example.MyClass.method1(MyClass.java:50)\n"
        "\tat com.example.UnknownClass.unknownMethod(Unknown Source)",
        "java.io.IOException", "IO error",
        [FR("com.example.MyClass", "method1", "MyClass.java", 50),
         FR("com.example.UnknownClass", "unknownMethod", "Unknown Source", -1)],
        None,
    ),
    (
        "No line numbers",
        "java.lang.Exception: Test\n"
        "\tat com.example.MyClass.method(MyClass.java)\n"
        "\tat com.example.AnotherClass.method(AnotherClass.java:100)",
        "java.lang.Exception", "Test",
        [FR("com.example.MyClass", "method", "MyClass.java", -1),
         FR("com.example.AnotherClass", "method", "AnotherClass.java", 100)],
        None,
    ),
    (
        "Explicit negative line numbers",
        "java.lang.RuntimeException: Error\n"
        "\tat com.example.MyClass.method(MyClass.java:-1)\n"
        "\tat com.example.AnotherClass.method(AnotherClass.java:-2)",
        "java.lang.RuntimeException", "Error",
        [FR("com.example.MyClass", "method", "MyClass.java", -1),
         FR("com.example.AnotherClass", "method", "AnotherClass.java", -2)],
        None,
    ),
    (
        "Obfuscated stack trace",
        "java.lang.RuntimeException: Error\n"
        "\tat a.b.c.d(SourceFile:10)\n"
        "\tat x.y.z(SourceFile:20)",
        "java.lang.RuntimeException", "Error",
        [FR("a.b.c", "d", "SourceFile", 10), FR("x.y", "z", "SourceFile", 20)],
        None,
    ),
    (
        "Inner class",
        "java.lang.IllegalStateException: Bad state\n"
        "\tat com.example.OuterClass$InnerClass.method(OuterClass.java:100)",
        "java.lang.IllegalStateException", "Bad state",
        [FR("com.example.OuterClass$InnerClass", "method", "OuterClass.java", 100)],
        None,
    ),
    (
        "Caused by preserved as raw line",
        "java.lang.RuntimeException: Error\n"
        "\tat com.example.MyClass.method(MyClass.java:100)\n"
        "Caused by: java.lang.IOException: IO error\n"
        "\tat com.example.IOClass.read(IOClass.java:50)",
        "java.lang.RuntimeException", "Error",
        [FR("com.example.MyClass", "method", "MyClass.java", 100),
         RAW("Caused by: java.lang.IOException: IO error"),
         FR("com.example.IOClass", "read", "IOClass.java", 50)],
        None,
    ),
    (
        "Empty lines skipped",
        "java.lang.RuntimeException: Error\n"
        "\tat com.example.MyClass.method(MyClass.java:100)\n"
        "\n"
        "\tat com.example.AnotherClass.method(AnotherClass.java:200)",
        "java.lang.RuntimeException", "Error",
        [FR("com.example.MyClass", "method", "MyClass.java", 100),
         FR("com.example.AnotherClass", "method", "AnotherClass.java", 200)],
        None,
    ),
    (
        "Empty message",
        "java.lang.RuntimeException:\n\tat com.example.MyClass.method(MyClass.java:100)",
        "java.lang.RuntimeException", "",
        [FR("com.example.MyClass", "method", "MyClass.java", 100)],
        None,
    ),
    (
        "Header with extra colons",
        "foo: bar: baz\n\tat com.example.MyClass.method(MyClass.java:100)",
        "foo", "bar: baz",
        [FR("com.example.MyClass", "method", "MyClass.java", 100)],
        None,
    ),
    (
        "Header with whitespace around colon",
        "foo.bar  :  baz\n\tat com.example.MyClass.method(MyClass.java:100)",
        "foo.bar", "baz",
        [FR("com.example.MyClass", "method", "MyClass.java", 100)],
        None,
    ),
    ("Empty string", "", None, None, None, ERR_EMPTY_STACK_TRACE),
    ("Only header", "java.lang.RuntimeException: Error", None, None, None, ERR_NO_FRAMES_PARSED),
    ("No header", "\tat com.example.MyClass.method(MyClass.java:100)", None, None, None,
     ERR_INVALID_STACK_TRACE),
    ("Random text", "This is not a stack trace", None, None, None, ERR_INVALID_STACK_TRACE),
]


@pytest.mark.parametrize("case", PARSE_CASES, ids=[c[0] for c in PARSE_CASES])
def test_parse_stack_trace(case):
    name, text, exp_type, exp_msg, exp_elements, exp_err = case
    if exp_err is not None:
        with pytest.raises(JavaParseError, match=exp_err):
            parse_stack_trace(text)
        return
    result = parse_stack_trace(text)
    assert result.exception_type == exp_type
    assert result.exception_message == exp_msg
    got = []
    for el in result.elements:
        if el.line != "":
            got.append(("raw", el.line))
        else:
            got.append(
                ("frame", el.frame.class_name, el.frame.method, el.frame.source_file, el.frame.line)
            )
    assert got == exp_elements


def test_parse_stack_frame_edges():
    assert parse_stack_frame("This is not a stack frame") is None
    assert parse_stack_frame("") is None
    assert parse_stack_frame("com.example.MyClass.method(MyClass.java:100)") is None
    f = parse_stack_frame("\tat a.b(SourceFile:5)")
    assert (f.class_name, f.method, f.source_file, f.line) == ("a", "b", "SourceFile", 5)


# ---------- mapper ----------

@pytest.fixture(scope="module")
def mapper(tmp_path_factory) -> ProguardMapper:
    d = tmp_path_factory.mktemp("proguard")
    write_proguard_mapping(str(d), UUID)
    with open(d / f"{UUID}.txt") as f:
        return ProguardMapper(f.read())


def test_mapper_basic_range(mapper):
    frames = mapper.remap_frame("a.b.c", "a", 5)
    assert frames == [
        RemappedJavaFrame(
            class_name="com.example.app.MainActivity",
            method_name="onCreate",
            line_number=44,
            source_file="MainActivity.java",
            parameter_names="android.os.Bundle",
        )
    ]


def test_mapper_inline_expansion(mapper):
    frames = mapper.remap_frame("a.b.c", "d", 11)
    assert [(f.class_name, f.method_name, f.line_number) for f in frames] == [
        ("com.example.app.MainActivity", "helper", 7),
        ("com.example.app.MainActivity", "onClick", 90),
    ]


def test_mapper_unknown_class_or_method(mapper):
    assert mapper.remap_frame("zz.zz", "a", 5) == []
    assert mapper.remap_frame("a.b.c", "zz", 5) == []


def test_mapper_negative_lines_no_mapping(mapper):
    assert mapper.remap_frame("a.b.c", "a", -1) == []
    assert mapper.remap_frame("a.b.c", "a", -2) == []


def test_mapper_rangeless_method(mapper):
    frames = mapper.remap_frame("a.b.c", "f", 77)
    assert [(f.method_name, f.line_number) for f in frames] == [("finish", 77)]


def test_mapper_second_class(mapper):
    frames = mapper.remap_frame("a.b.d", "a", 10)
    assert frames[0].class_name == "com.example.app.Util"
    assert frames[0].source_file == "Util.java"
    assert frames[0].line_number == 205


# ---------- symbolicator (integration with store) ----------

def test_proguard_symbolicator_fetch_and_cache(tmp_path):
    write_proguard_mapping(str(tmp_path), UUID)
    sym = ProguardSymbolicator(ProguardStore(str(tmp_path)))
    frames = sym.symbolicate(UUID, "a.b.c", "a", 1)
    assert frames[0].method_name == "onCreate"
    assert len(sym.cache) == 1
    with pytest.raises(ProguardFetchError) as ei:
        sym.symbolicate("unknown-uuid", "a.b.c", "a", 1)
    assert "failed to fetch ProGuard mapping for unknown-uuid" in str(ei.value)
    assert sym.fetch_failures == 1


# ---------- processor ----------

class FakeProguardSymbolicator:
    def __init__(self, frames=None, err=None):
        self.frames = frames or []
        self.err = err
        self.call_count = 0

    def symbolicate(self, uuid, class_name, method, line):
        self.call_count += 1
        if self.err is not None:
            raise self.err
        return self.frames


def make_proc(sym=None, **cfg_kw):
    sym = sym if sym is not None else FakeProguardSymbolicator()
    return ProguardLogProcessor(cfg=ProguardConfig(**cfg_kw), symbolicator=sym), sym


def _structured(cfg, uuid=UUID):
    return {
        cfg.classes_attribute_key: ["a.b.c", "a.b.c"],
        cfg.methods_attribute_key: ["a", "d"],
        cfg.lines_attribute_key: [5, 11],
        cfg.source_files_attribute_key: ["SourceFile", "SourceFile"],
        cfg.stack_trace_attribute_key: "java.lang.RuntimeException: boom\n\tat a.b.c.a(SourceFile:5)\n\tat a.b.c.d(SourceFile:11)",
        cfg.exception_type_attribute_key: "java.lang.RuntimeException",
        cfg.exception_message_attribute_key: "boom",
        cfg.proguard_uuid_attribute_key: uuid,
    }


def test_proc_skip_without_stacktrace():
    proc, sym = make_proc()
    attrs = {"foo": "bar"}
    assert not proc.process_attributes(attrs, {})
    assert attrs == {"foo": "bar"}
    assert sym.call_count == 0


def test_proc_missing_uuid():
    proc, sym = make_proc()
    cfg = proc.cfg
    attrs = _structured(cfg)
    del attrs[cfg.proguard_uuid_attribute_key]
    assert proc.process_attributes(attrs, {})
    assert attrs[cfg.symbolicator_failure_attribute_key] is True
    assert (
        attrs[cfg.symbolicator_error_attribute_key]
        == "missing attribute: app.debug.proguard_uuid"
    )
    assert sym.call_count == 0


def test_proc_uuid_from_resource_attrs():
    proc, sym = make_proc()
    cfg = proc.cfg
    attrs = _structured(cfg)
    del attrs[cfg.proguard_uuid_attribute_key]
    assert proc.process_attributes(attrs, {cfg.proguard_uuid_attribute_key: UUID})
    assert attrs[cfg.symbolicator_failure_attribute_key] is False
    assert sym.call_count == 2


def test_proc_one_to_n_expansion():
    frames = [
        RemappedJavaFrame("com.example.Deep", "inner", 7, "Deep.java"),
        RemappedJavaFrame("com.example.Outer", "outer", 90, "Outer.java"),
    ]
    proc, sym = make_proc(sym=FakeProguardSymbolicator(frames=frames))
    cfg = proc.cfg
    attrs = _structured(cfg)
    assert proc.process_attributes(attrs, {})
    # 2 input frames -> 4 output entries (each expands to 2)
    assert attrs[cfg.classes_attribute_key] == [
        "com.example.Deep", "com.example.Outer", "com.example.Deep", "com.example.Outer"
    ]
    assert attrs[cfg.lines_attribute_key] == [7, 90, 7, 90]
    st = attrs[cfg.stack_trace_attribute_key]
    assert st.splitlines()[0] == "java.lang.RuntimeException: boom"
    assert "\tat com.example.Deep.inner(Deep.java:7)" in st
    assert "\tat com.example.Outer.outer(Outer.java:90)" in st
    # originals preserved (default on); source_files attr NOT rebuilt
    assert attrs[cfg.original_classes_attribute_key] == ["a.b.c", "a.b.c"]
    assert attrs[cfg.source_files_attribute_key] == ["SourceFile", "SourceFile"]


def test_proc_empty_mapping_echo():
    proc, sym = make_proc()  # returns []
    cfg = proc.cfg
    attrs = {
        cfg.classes_attribute_key: ["com.x.A", "com.x.B", "com.x.C"],
        cfg.methods_attribute_key: ["m1", "m2", "m3"],
        cfg.lines_attribute_key: [-2, -1, 42],
        cfg.source_files_attribute_key: ["", "", "C.java"],
        cfg.stack_trace_attribute_key: "raw",
        cfg.proguard_uuid_attribute_key: UUID,
    }
    assert proc.process_attributes(attrs, {})
    assert attrs[cfg.symbolicator_failure_attribute_key] is False
    st = attrs[cfg.stack_trace_attribute_key]
    assert st.splitlines() == [
        "\tat com.x.A.m1(Native Method)",
        "\tat com.x.B.m2(Unknown Source)",
        "\tat com.x.C.m3(C.java:42)",
    ]
    assert attrs[cfg.classes_attribute_key] == ["com.x.A", "com.x.B", "com.x.C"]
    assert attrs[cfg.lines_attribute_key] == [-2, -1, 42]


def test_proc_invalid_line_numbers():
    proc, sym = make_proc()
    cfg = proc.cfg
    attrs = _structured(cfg)
    attrs[cfg.lines_attribute_key] = [-3, MAX_U32 + 1]
    assert proc.process_attributes(attrs, {})
    assert attrs[cfg.symbolicator_failure_attribute_key] is True
    assert (
        attrs[cfg.symbolicator_error_attribute_key]
        == "symbolication failed for some stack frames"
    )
    st = attrs[cfg.stack_trace_attribute_key]
    assert "\tInvalid line number -3 for a.b.c.a" in st
    assert f"\tInvalid line number {MAX_U32 + 1} for a.b.c.d" in st
    assert sym.call_count == 0  # invalid lines never reach the symbolicator


def test_proc_raw_parse_fallback_with_raw_lines():
    frames = [RemappedJavaFrame("com.example.Real", "real", 10, "Real.java")]
    proc, sym = make_proc(sym=FakeProguardSymbolicator(frames=frames))
    cfg = proc.cfg
    raw = (
        "java.lang.RuntimeException: kaput\n"
        "\tat a.b.c.a(SourceFile:5)\n"
        "Caused by: java.lang.IOException: io\n"
        "\tat a.b.c.d(SourceFile:11)"
    )
    attrs = {
        cfg.stack_trace_attribute_key: raw,
        cfg.proguard_uuid_attribute_key: UUID,
    }
    assert proc.process_attributes(attrs, {})
    assert attrs[cfg.symbolicator_parsing_method_attribute_key] == "processor_parsed"
    assert attrs[cfg.exception_type_attribute_key] == "java.lang.RuntimeException"
    assert attrs[cfg.exception_message_attribute_key] == "kaput"
    st = attrs[cfg.stack_trace_attribute_key]
    assert st.splitlines() == [
        "java.lang.RuntimeException: kaput",
        "\tat com.example.Real.real(Real.java:10)",
        "Caused by: java.lang.IOException: io",
        "\tat com.example.Real.real(Real.java:10)",
    ]
    # parsed route does not rebuild structured attrs
    assert cfg.classes_attribute_key not in attrs
    assert attrs[cfg.original_stack_trace_attribute_key] == raw


def test_proc_fetch_error_cached_single_call():
    err = ProguardFetchError(UUID, SymbolicationError("boom"))
    proc, sym = make_proc(sym=FakeProguardSymbolicator(err=err))
    cfg = proc.cfg
    n = 10
    attrs = {
        cfg.classes_attribute_key: [f"c{i}" for i in range(n)],
        cfg.methods_attribute_key: [f"m{i}" for i in range(n)],
        cfg.lines_attribute_key: list(range(1, n + 1)),
        cfg.source_files_attribute_key: ["S"] * n,
        cfg.stack_trace_attribute_key: "raw",
        cfg.proguard_uuid_attribute_key: UUID,
    }
    assert proc.process_attributes(attrs, {})
    assert sym.call_count == 1  # FetchError cached per-record by uuid
    st = attrs[cfg.stack_trace_attribute_key]
    assert st.count("Failed to symbolicate") == n
    assert f"failed to fetch ProGuard mapping for {UUID}: boom" in st


def test_proc_non_fetch_error_not_cached():
    err = SymbolicationError("parse failure")
    proc, sym = make_proc(sym=FakeProguardSymbolicator(err=err))
    cfg = proc.cfg
    attrs = {
        cfg.classes_attribute_key: ["a", "b", "c"],
        cfg.methods_attribute_key: ["m", "m", "m"],
        cfg.lines_attribute_key: [1, 2, 3],
        cfg.source_files_attribute_key: ["S", "S", "S"],
        cfg.stack_trace_attribute_key: "raw",
        cfg.proguard_uuid_attribute_key: UUID,
    }
    assert proc.process_attributes(attrs, {})
    assert sym.call_count == 3


def test_proc_language_filter():
    proc, sym = make_proc(allowed_languages=["java", "kotlin"])
    cfg = proc.cfg
    attrs = _structured(cfg)
    attrs[cfg.language_attribute_key] = "webjs"
    assert not proc.process_attributes(attrs, {})
    attrs2 = _structured(cfg)
    assert proc.process_attributes(attrs2, {cfg.language_attribute_key: "Kotlin"})


def test_per_record_error_cache_isolation():
    """The negative cache is per RECORD, not per actor: a second record
    with the same uuid re-attempts the fetch (multi-UUID dedup tests,
    proguardprocessor/log_processor_test.go:1050-1221)."""
    err = ProguardFetchError(UUID, SymbolicationError("boom"))
    proc, sym = make_proc(sym=FakeProguardSymbolicator(err=err))
    cfg = proc.cfg

    def attrs():
        return {
            cfg.classes_attribute_key: ["a", "b"],
            cfg.methods_attribute_key: ["m", "m"],
            cfg.lines_attribute_key: [1, 2],
            cfg.source_files_attribute_key: ["S", "S"],
            cfg.stack_trace_attribute_key: "raw",
            cfg.proguard_uuid_attribute_key: UUID,
        }

    assert proc.process_attributes(attrs(), {})
    assert sym.call_count == 1  # cached within record 1
    assert proc.process_attributes(attrs(), {})
    assert sym.call_count == 2  # fresh cache for record 2
