"""ProGuard/R8 ``mapping.txt`` parser + frame remapper (the math behind
operator Y2).

The reference delegates this to ``symbolic.NewProguardMapper(path)`` /
``pm.RemapFrame(class, method, line)``
(proguardprocessor/symbolicator.go:95-143).  This is a from-scratch
implementation of the public ProGuard mapping format
(https://www.guardsquare.com/manual/tools/retrace):

    original.Class -> obf:
    # {"id":"sourceFile","fileName":"X.java"}      (R8 metadata)
        ret original.Class field -> f
        N:M:ret method(args):P:Q -> m              (line-range mapping)
        N:M:ret other.Class.method(args):P -> m    (inlined cross-class)

Inline chains are consecutive entries sharing an obfuscated line range;
``remap_frame`` returns them innermost-first (matching retrace and the
1->N expansion consumed at proguardprocessor/log_processor.go:295-304).
An unknown class/method or an out-of-range line returns [] — the
reference's "no mapping found or needed" echo path
(log_processor.go:274-293).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

_CLASS_RE = re.compile(r"^(\S+) -> (\S+):$", re.A)
_MEMBER_RE = re.compile(
    r"^\s+(?:(\d+):(\d+):)?(\S+)\s+([^\s(]+)\((.*?)\)(?::(-?\d+))?(?::(-?\d+))?\s*->\s*(\S+)\s*$",
    re.A,
)


@dataclass
class MethodEntry:
    start: int | None
    end: int | None
    original_name: str  # possibly fully qualified (inlined cross-class)
    args: str
    orig_start: int | None
    orig_end: int | None


@dataclass
class ClassMapping:
    original_name: str
    source_file: str | None = None
    methods: dict[str, list[MethodEntry]] = field(default_factory=dict)


@dataclass
class RemappedJavaFrame:
    class_name: str
    method_name: str
    line_number: int
    source_file: str
    parameter_names: str = ""


def _default_source_file(class_name: str) -> str:
    simple = class_name.rsplit(".", 1)[-1]
    simple = simple.split("$", 1)[0]
    return f"{simple}.java"


class ProguardMapper:
    def __init__(self, mapping_text: str) -> None:
        self.classes: dict[str, ClassMapping] = {}
        self._orig_source_files: dict[str, str] = {}
        current: ClassMapping | None = None

        for raw_line in mapping_text.splitlines():
            if not raw_line.strip():
                continue
            if raw_line.lstrip().startswith("#"):
                # R8 metadata comments; we honor sourceFile.
                payload = raw_line.lstrip()[1:].strip()
                if current is not None and "fileName" in payload:
                    try:
                        meta = json.loads(payload)
                    except ValueError:
                        continue
                    name = meta.get("fileName")
                    if isinstance(name, str):
                        current.source_file = name
                        self._orig_source_files[current.original_name] = name
                continue

            m = _CLASS_RE.match(raw_line)
            if m is not None:
                current = ClassMapping(original_name=m.group(1))
                self.classes[m.group(2)] = current
                continue

            if current is None:
                continue
            m = _MEMBER_RE.match(raw_line)
            if m is None:
                continue
            start, end, _ret, name, args, orig_start, orig_end, obf = m.groups()
            if "(" not in raw_line:
                continue  # field line (no parens) — not reachable via regex, kept for clarity
            entry = MethodEntry(
                start=int(start) if start else None,
                end=int(end) if end else None,
                original_name=name,
                args=args,
                orig_start=int(orig_start) if orig_start else None,
                orig_end=int(orig_end) if orig_end else None,
            )
            current.methods.setdefault(obf, []).append(entry)

    def _frame_for_entry(self, cls: ClassMapping, entry: MethodEntry, line: int) -> RemappedJavaFrame:
        if "." in entry.original_name:
            class_name, method_name = entry.original_name.rsplit(".", 1)
        else:
            class_name, method_name = cls.original_name, entry.original_name

        if entry.orig_start is None:
            mapped_line = line
        elif entry.orig_end is None or entry.orig_end == entry.orig_start:
            mapped_line = entry.orig_start
        else:
            mapped_line = entry.orig_start + (line - (entry.start or 0))

        source_file = self._orig_source_files.get(class_name)
        if source_file is None:
            if class_name == cls.original_name and cls.source_file is not None:
                source_file = cls.source_file
            else:
                source_file = _default_source_file(class_name)

        return RemappedJavaFrame(
            class_name=class_name,
            method_name=method_name,
            line_number=mapped_line,
            source_file=source_file,
            parameter_names=entry.args,
        )

    def remap_frame(self, obf_class: str, obf_method: str, line: int) -> list[RemappedJavaFrame]:
        cls = self.classes.get(obf_class)
        if cls is None:
            return []
        entries = cls.methods.get(obf_method)
        if not entries:
            return []

        if line > 0:
            matching = [
                e for e in entries if e.start is not None and e.start <= line <= (e.end or e.start)
            ]
            if matching:
                return [self._frame_for_entry(cls, e, line) for e in matching]
            # Fall back to range-less entries (match any line).
            rangeless = [e for e in entries if e.start is None]
            if rangeless:
                return [self._frame_for_entry(cls, rangeless[0], line)]
            return []

        # line <= 0 (Native Method / Unknown Source): no positional mapping.
        return []
