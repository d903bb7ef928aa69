"""Java/Kotlin raw stack-trace parser (operator P3, SURVEY.md §2.3).

Behavioral port of proguardprocessor/stack_trace_parser.go:39-155:
header regex extracts exception type+message; per-line frame regex;
``Native Method`` -> line -2, missing line -> -1; unparseable non-empty
lines preserved verbatim as raw elements, interleaved in order.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

ERR_EMPTY_STACK_TRACE = "stack trace is empty"
ERR_INVALID_STACK_TRACE = "invalid stack trace format"
ERR_NO_FRAMES_PARSED = "no valid stack frames found in stack trace"

# proguardprocessor/stack_trace_parser.go:51 and :66.
_HEADER_RE = re.compile(r"^([^\s:]+)\s*:\s*(.*)$", re.A)
_FRAME_RE = re.compile(r"^\s*at\s+([^\s(]+)\.([^\s.(]+)\(([^:)]+)(?::(-?\d+))?\)\s*$", re.A)


class JavaParseError(Exception):
    pass


@dataclass
class JavaStackFrame:
    class_name: str
    method: str
    line: int
    source_file: str


@dataclass
class JavaStackElement:
    """Either a parsed frame or a preserved raw line, never both."""

    frame: JavaStackFrame | None = None
    line: str = ""


@dataclass
class JavaStackTrace:
    exception_type: str = ""
    exception_message: str = ""
    elements: list[JavaStackElement] = field(default_factory=list)


def parse_stack_frame(line: str) -> JavaStackFrame | None:
    """stack_trace_parser.go:125-155."""
    m = _FRAME_RE.search(line)
    if m is None:
        return None
    class_name, method_name, source_info, line_num_str = (
        m.group(1),
        m.group(2),
        m.group(3),
        m.group(4) or "",
    )
    frame = JavaStackFrame(
        class_name=class_name, method=method_name, source_file=source_info, line=-1
    )
    if source_info == "Native Method":
        frame.line = -2  # Android convention for native methods
    elif line_num_str != "":
        frame.line = int(line_num_str)
    return frame


def parse_stack_trace(stack_trace_str: str) -> JavaStackTrace:
    """stack_trace_parser.go:72-121."""
    if stack_trace_str == "":
        raise JavaParseError(ERR_EMPTY_STACK_TRACE)

    lines = stack_trace_str.split("\n")
    result = JavaStackTrace()

    first_line = lines[0].strip()
    m = _HEADER_RE.search(first_line) if first_line != "" else None
    if m is not None:
        result.exception_type = m.group(1)
        result.exception_message = m.group(2)
    else:
        raise JavaParseError(ERR_INVALID_STACK_TRACE)

    for line in lines[1:]:
        if line.strip() == "":
            continue
        frame = parse_stack_frame(line)
        if frame is not None:
            result.elements.append(JavaStackElement(frame=frame))
        else:
            result.elements.append(JavaStackElement(line=line))

    if not result.elements:
        raise JavaParseError(ERR_NO_FRAMES_PARSED)

    return result
