"""JavaScript raw stack-trace parser (operator P1, SURVEY.md §2.3).

Behavioral port of the reference's TraceKit-derived parser
(sourcemapprocessor/stack_trace_parser.go:20-430; TraceKit itself is
MIT-licensed public code).  Strategy order, regexes, eval unwrapping,
missing-function ``"?"``, native-url rewrites and nullable line/column
semantics all match; the 45-case browser conformance corpus in
tests/test_js_stack_parser.py is the safety net for Go-RE2 -> Python-re
translation differences.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

UNKNOWN_FUNCTION = "?"

PARSE_MODE_STACK = "stack"
PARSE_MODE_STACKTRACE = "stacktrace"
PARSE_MODE_MULTILINE = "multiline"

# Regexes translated from sourcemapprocessor/stack_trace_parser.go:20-46.
_REACT_NATIVE_RE = re.compile(
    r"^\s*at (.*?) ?\(address at (.+?)(?::(\d+))?(?::(\d+))?\)\s*$", re.I | re.A
)
_CHROME_RE = re.compile(
    r"^\s*at (.*?) ?\(((?:file|https?|blob|chrome-extension|native|eval|webpack|<anonymous>|\/).*?)"
    r"(?::(\d+))?(?::(\d+))?\)?\s*$",
    re.I | re.A,
)
_GECKO_RE = re.compile(
    r"^\s*(.*?)(?:\((.*?)\))?(?:^|@)((?:file|https?|blob|chrome|webpack|resource|\[native).*?|[^@]*bundle)"
    r"(?::(\d+))?(?::(\d+))?\s*$",
    re.I | re.A,
)
_WINJS_RE = re.compile(
    r"^\s*at (?:((?:\[object object\])?.+) )?\(?((?:file|ms-appx|https?|webpack|blob):.*?):(\d+)(?::(\d+))?\)?\s*$",
    re.I | re.A,
)
_GECKO_EVAL_RE = re.compile(r"(\S+) line (\d+)(?: > eval line \d+)* > eval", re.I | re.A)
_CHROME_EVAL_RE = re.compile(r"\((\S*)(?::(\d+))(?::(\d+))\)", re.A)

_OPERA11_RE = re.compile(r" line (\d+).*script (?:in )?(\S+)(?:: in function (\S+))?$", re.I | re.A)
_OPERA11_COLUMN_RE = re.compile(
    r" line (\d+), column (\d+)\s*(?:in (?:<anonymous function: ([^>]+)>|([^\)]+))\((.*)\))? in (.*):\s*$",
    re.I | re.A,
)

_OPERA9_LINKED_RE = re.compile(
    r"^\s*Line (\d+) of linked script ((?:file|https?|blob)\S+)(?:: in function (\S+))?\s*$", re.I | re.A
)
_OPERA9_INLINE_RE = re.compile(
    r"^\s*Line (\d+) of inline#(\d+) script in ((?:file|https?|blob)\S+)(?:: in function (\S+))?\s*$",
    re.I | re.A,
)
_OPERA9_FUNCTION_RE = re.compile(r"^\s*Line (\d+) of function script\s*$", re.I | re.A)


@dataclass
class JsStackFrame:
    url: str
    func_name: str
    line: int | None = None
    column: int | None = None


@dataclass
class JsStackTrace:
    name: str
    message: str
    mode: str
    frames: list[JsStackFrame]


def _grp(m: re.Match, i: int) -> str:
    """Go FindStringSubmatch yields "" for unparticipating groups."""
    g = m.group(i)
    return g if g is not None else ""


def _opt_int(s: str) -> int | None:
    return int(s) if s else None


def _parse_stack_prop(name: str, message: str, stack: str) -> JsStackTrace | None:
    """Chrome/V8, Gecko, WinJS, React Native formats
    (stack_trace_parser.go:82-207)."""
    if stack == "":
        return None

    frames: list[JsStackFrame] = []
    for line in stack.split("\n"):
        m = _REACT_NATIVE_RE.search(line)
        if m is not None:
            el = JsStackFrame(url=_grp(m, 2), func_name=_grp(m, 1))
            el.line = _opt_int(_grp(m, 3))
            el.column = _opt_int(_grp(m, 4))
            if el.func_name == "":
                el.func_name = UNKNOWN_FUNCTION
            frames.append(el)
            continue

        m = _CHROME_RE.search(line)
        if m is not None:
            url = _grp(m, 2)
            line_no = _grp(m, 3)
            col = _grp(m, 4)
            if url.startswith("eval"):
                em = _CHROME_EVAL_RE.search(url)
                if em is not None:
                    url = _grp(em, 1)
                    line_no = _grp(em, 2)
                    col = _grp(em, 3)
            if _grp(m, 2).startswith("native"):
                url = "(native)"
            el = JsStackFrame(url=url, func_name=_grp(m, 1))
            el.line = _opt_int(line_no)
            el.column = _opt_int(col)
            if el.func_name == "":
                el.func_name = UNKNOWN_FUNCTION
            frames.append(el)
            continue

        m = _WINJS_RE.search(line)
        if m is not None:
            el = JsStackFrame(url=_grp(m, 2), func_name=_grp(m, 1))
            el.line = _opt_int(_grp(m, 3))
            el.column = _opt_int(_grp(m, 4))
            if el.func_name == "":
                el.func_name = UNKNOWN_FUNCTION
            frames.append(el)
            continue

        m = _GECKO_RE.search(line)
        if m is not None:
            url = _grp(m, 3)
            line_no = _grp(m, 4)
            col = _grp(m, 5)
            if " > eval" in url:
                em = _GECKO_EVAL_RE.search(url)
                if em is not None:
                    url = _grp(em, 1)
                    line_no = _grp(em, 2)
                    col = ""
            el = JsStackFrame(url=url, func_name=_grp(m, 1))
            el.line = _opt_int(line_no)
            el.column = _opt_int(col)
            if el.func_name == "":
                el.func_name = UNKNOWN_FUNCTION
            frames.append(el)
            continue

    if not frames:
        return None
    return JsStackTrace(name=name, message=message, mode=PARSE_MODE_STACK, frames=frames)


def _parse_opera11(name: str, message: str, stacktrace: str) -> JsStackTrace | None:
    """Opera 11+ stacktrace property (stack_trace_parser.go:210-270)."""
    if stacktrace == "":
        return None

    lines = stacktrace.split("\n")
    frames: list[JsStackFrame] = []
    for i in range(0, len(lines), 2):
        el: JsStackFrame | None = None
        m = _OPERA11_RE.search(lines[i])
        if m is not None:
            func = _grp(m, 3) or UNKNOWN_FUNCTION
            el = JsStackFrame(url=_grp(m, 2), func_name=func)
            el.line = _opt_int(_grp(m, 1))
        else:
            m = _OPERA11_COLUMN_RE.search(lines[i])
            if m is not None:
                func = _grp(m, 3) or _grp(m, 4) or UNKNOWN_FUNCTION
                el = JsStackFrame(url=_grp(m, 6), func_name=func)
                el.line = _opt_int(_grp(m, 1))
                el.column = _opt_int(_grp(m, 2))
        if el is not None:
            frames.append(el)

    if not frames:
        return None
    return JsStackTrace(name=name, message=message, mode=PARSE_MODE_STACKTRACE, frames=frames)


def _opera9_style_frame(line: str) -> JsStackFrame | None:
    """Shared Opera 9/10 line parse (stack_trace_parser.go:284-315, 346-377)."""
    m = _OPERA9_LINKED_RE.search(line)
    if m is not None:
        func = _grp(m, 3) or UNKNOWN_FUNCTION
        item = JsStackFrame(url=_grp(m, 2), func_name=func)
        item.line = _opt_int(_grp(m, 1))
        return item
    m = _OPERA9_INLINE_RE.search(line)
    if m is not None:
        func = _grp(m, 4) or UNKNOWN_FUNCTION
        item = JsStackFrame(url=_grp(m, 3), func_name=func)
        item.line = _opt_int(_grp(m, 1))
        return item
    m = _OPERA9_FUNCTION_RE.search(line)
    if m is not None:
        return JsStackFrame(url="", func_name=UNKNOWN_FUNCTION)
    return None


def _parse_opera9_message(name: str, message: str) -> JsStackTrace | None:
    """Opera 9 message property (stack_trace_parser.go:273-332)."""
    lines = message.split("\n")
    if len(lines) < 4:
        return None

    frames: list[JsStackFrame] = []
    for i in range(2, len(lines), 2):
        item = _opera9_style_frame(lines[i])
        if item is not None:
            frames.append(item)

    if not frames:
        return None
    return JsStackTrace(name=name, message=lines[0], mode=PARSE_MODE_MULTILINE, frames=frames)


def _parse_opera10(name: str, message: str, stacktrace: str) -> JsStackTrace | None:
    """Opera 10 stacktrace property (stack_trace_parser.go:335-394)."""
    lines = stacktrace.split("\n")
    if len(lines) < 2:
        return None

    frames: list[JsStackFrame] = []
    for i in range(0, len(lines), 2):
        item = _opera9_style_frame(lines[i])
        if item is not None:
            frames.append(item)

    if not frames:
        return None
    return JsStackTrace(name=name, message=message, mode=PARSE_MODE_STACKTRACE, frames=frames)


class JsParseError(Exception):
    def __init__(self) -> None:
        super().__init__("failed to parse stack trace")


def compute_stack_trace(name: str, message: str, stack: str) -> JsStackTrace:
    """Strategy driver (stack_trace_parser.go:396-430): Opera 11+ ->
    stack prop (Chrome/Gecko/WinJS/RN) -> Opera 10 -> Opera 9 message.
    Raises JsParseError("failed to parse stack trace") when all fail."""
    if stack != "":
        result = _parse_opera11(name, message, stack)
        if result is not None:
            return result
        result = _parse_stack_prop(name, message, stack)
        if result is not None:
            return result
        result = _parse_opera10(name, message, stack)
        if result is not None:
            return result

    result = _parse_opera9_message(name, message)
    if result is not None:
        return result

    raise JsParseError()
