"""JS parser conformance corpus, ported from the reference's
sourcemapprocessor/stack_trace_parser_test.go:20-888 (itself adapted from
MIT-licensed TraceKit).  Every case asserts name/message/mode and the
full frame list including nullable line/column."""

from __future__ import annotations

import pytest

from opentelemetry_collector_symbolicator_ray.functions.js_stack_parser import (
    JsParseError,
    compute_stack_trace,
)

U = "?"  # unknownFunction


def F(url, fn, line=None, col=None):
    return (url, fn, line, col)


MAX_U32 = 4294967295

CASES = [
    # (name, exc_name, exc_msg, stack, expect_error, exp_name, exp_msg, frames, mode)
    (
        "Safari 6 error", "TypeError", "'null' is not an object (evaluating 'x.undef')",
        "@http://path/to/file.js:48\n"
        "dumpException3@http://path/to/file.js:52\n"
        "onclick@http://path/to/file.js:82\n"
        "[native code]",
        False, "TypeError", "'null' is not an object (evaluating 'x.undef')",
        [
            F("http://path/to/file.js", U, 48),
            F("http://path/to/file.js", "dumpException3", 52),
            F("http://path/to/file.js", "onclick", 82),
            F("[native code]", U),
        ],
        "stack",
    ),
    (
        "Safari 7 error", "TypeError", "'null' is not an object (evaluating 'x.undef')",
        "http://path/to/file.js:48:22\n"
        "foo@http://path/to/file.js:52:15\n"
        "bar@http://path/to/file.js:108:107",
        False, "TypeError", "'null' is not an object (evaluating 'x.undef')",
        [
            F("http://path/to/file.js", U, 48, 22),
            F("http://path/to/file.js", "foo", 52, 15),
            F("http://path/to/file.js", "bar", 108, 107),
        ],
        "stack",
    ),
    (
        "Safari 8 error", "TypeError", "null is not an object (evaluating 'x.undef')",
        "http://path/to/file.js:47:22\n"
        "foo@http://path/to/file.js:52:15\n"
        "bar@http://path/to/file.js:108:23",
        False, "TypeError", "null is not an object (evaluating 'x.undef')",
        [
            F("http://path/to/file.js", U, 47, 22),
            F("http://path/to/file.js", "foo", 52, 15),
            F("http://path/to/file.js", "bar", 108, 23),
        ],
        "stack",
    ),
    (
        "Safari 8 eval error", "ReferenceError", "Can't find variable: getExceptionProps",
        "eval code\n"
        "eval@[native code]\n"
        "foo@http://path/to/file.js:58:21\n"
        "bar@http://path/to/file.js:109:91",
        False, "ReferenceError", "Can't find variable: getExceptionProps",
        [
            F("[native code]", "eval"),
            F("http://path/to/file.js", "foo", 58, 21),
            F("http://path/to/file.js", "bar", 109, 91),
        ],
        "stack",
    ),
    (
        "Firefox 3 error", "TypeError", "this.undef is not a function",
        "()@http://127.0.0.1:8000/js/stacktrace.js:44\n"
        "(null)@http://127.0.0.1:8000/js/stacktrace.js:31\n"
        "printStackTrace()@http://127.0.0.1:8000/js/stacktrace.js:18\n"
        "bar(1)@http://127.0.0.1:8000/js/file.js:13\n"
        "bar(2)@http://127.0.0.1:8000/js/file.js:16\n"
        "foo()@http://127.0.0.1:8000/js/file.js:20\n"
        "@http://127.0.0.1:8000/js/file.js:24\n",
        False, "TypeError", "this.undef is not a function",
        [
            F("http://127.0.0.1:8000/js/stacktrace.js", U, 44),
            F("http://127.0.0.1:8000/js/stacktrace.js", U, 31),
            F("http://127.0.0.1:8000/js/stacktrace.js", "printStackTrace", 18),
            F("http://127.0.0.1:8000/js/file.js", "bar", 13),
            F("http://127.0.0.1:8000/js/file.js", "bar", 16),
            F("http://127.0.0.1:8000/js/file.js", "foo", 20),
            F("http://127.0.0.1:8000/js/file.js", U, 24),
        ],
        "stack",
    ),
    (
        "Firefox 7 error", "TypeError", "this.undef is not a function",
        "()@file:///G:/js/stacktrace.js:44\n"
        "(null)@file:///G:/js/stacktrace.js:31\n"
        "printStackTrace()@file:///G:/js/stacktrace.js:18\n"
        "bar(1)@file:///G:/js/file.js:13\n"
        "bar(2)@file:///G:/js/file.js:16\n"
        "foo()@file:///G:/js/file.js:20\n"
        "@file:///G:/js/file.js:24\n",
        False, "TypeError", "this.undef is not a function",
        [
            F("file:///G:/js/stacktrace.js", U, 44),
            F("file:///G:/js/stacktrace.js", U, 31),
            F("file:///G:/js/stacktrace.js", "printStackTrace", 18),
            F("file:///G:/js/file.js", "bar", 13),
            F("file:///G:/js/file.js", "bar", 16),
            F("file:///G:/js/file.js", "foo", 20),
            F("file:///G:/js/file.js", U, 24),
        ],
        "stack",
    ),
    (
        "Firefox 14 error", "TypeError", "x is null",
        "@http://path/to/file.js:48\n"
        "dumpException3@http://path/to/file.js:52\n"
        "onclick@http://path/to/file.js:1\n",
        False, "TypeError", "x is null",
        [
            F("http://path/to/file.js", U, 48),
            F("http://path/to/file.js", "dumpException3", 52),
            F("http://path/to/file.js", "onclick", 1),
        ],
        "stack",
    ),
    (
        "Firefox 31 error", "Error", "Default error",
        "foo@http://path/to/file.js:41:13\n"
        "bar@http://path/to/file.js:1:1\n"
        ".plugin/e.fn[c]/<@http://path/to/file.js:1:1\n",
        False, "Error", "Default error",
        [
            F("http://path/to/file.js", "foo", 41, 13),
            F("http://path/to/file.js", "bar", 1, 1),
            F("http://path/to/file.js", ".plugin/e.fn[c]/<", 1, 1),
        ],
        "stack",
    ),
    (
        "Firefox 43 eval error", "Error", "message string",
        "baz@http://localhost:8080/file.js line 26 > eval line 2 > eval:1:30\n"
        "foo@http://localhost:8080/file.js line 26 > eval:2:96\n"
        "@http://localhost:8080/file.js line 26 > eval:4:18\n"
        "speak@http://localhost:8080/file.js:26:17\n"
        "@http://localhost:8080/file.js:33:9",
        False, "Error", "message string",
        [
            F("http://localhost:8080/file.js", "baz", 26),
            F("http://localhost:8080/file.js", "foo", 26),
            F("http://localhost:8080/file.js", U, 26),
            F("http://localhost:8080/file.js", "speak", 26, 17),
            F("http://localhost:8080/file.js", U, 33, 9),
        ],
        "stack",
    ),
    (
        "Firefox 44 NS Exception", "NS_ERROR_FAILURE", "",
        "[2]</Bar.prototype._baz/</<@http://path/to/file.js:703:28\n"
        "App.prototype.foo@file:///path/to/file.js:15:2\n"
        "bar@file:///path/to/file.js:20:3\n"
        "@file:///path/to/index.html:23:1\n",
        False, "NS_ERROR_FAILURE", "",
        [
            F("http://path/to/file.js", "[2]</Bar.prototype._baz/</<", 703, 28),
            F("file:///path/to/file.js", "App.prototype.foo", 15, 2),
            F("file:///path/to/file.js", "bar", 20, 3),
            F("file:///path/to/index.html", U, 23, 1),
        ],
        "stack",
    ),
    (
        "Firefox 50 resource URL", "TypeError",
        "this.props.raw[this.state.dataSource].rows is undefined",
        "render@resource://path/data/content/bundle.js:5529:16\n"
        "dispatchEvent@resource://path/data/content/vendor.bundle.js:18:23028\n"
        "wrapped@resource://path/data/content/bundle.js:7270:25",
        False, "TypeError", "this.props.raw[this.state.dataSource].rows is undefined",
        [
            F("resource://path/data/content/bundle.js", "render", 5529, 16),
            F("resource://path/data/content/vendor.bundle.js", "dispatchEvent", 18, 23028),
            F("resource://path/data/content/bundle.js", "wrapped", 7270, 25),
        ],
        "stack",
    ),
    (
        "Chrome 15 error", "TypeError", "Object #<Object> has no method 'undef'",
        "TypeError: Object #<Object> has no method 'undef'\n"
        "    at bar (http://path/to/file.js:13:17)\n"
        "    at bar (http://path/to/file.js:16:5)\n"
        "    at foo (http://path/to/file.js:20:5)\n"
        "    at http://path/to/file.js:24:4",
        False, "TypeError", "Object #<Object> has no method 'undef'",
        [
            F("http://path/to/file.js", "bar", 13, 17),
            F("http://path/to/file.js", "bar", 16, 5),
            F("http://path/to/file.js", "foo", 20, 5),
            F("http://path/to/file.js", U, 24, 4),
        ],
        "stack",
    ),
    (
        "Chrome 36 error with port numbers", "Error", "Default error",
        "Error: Default error\n"
        "    at dumpExceptionError (http://localhost:8080/file.js:41:27)\n"
        "    at HTMLButtonElement.onclick (http://localhost:8080/file.js:107:146)\n"
        "    at I.e.fn.(anonymous function) [as index] (http://localhost:8080/file.js:10:3651)",
        False, "Error", "Default error",
        [
            F("http://localhost:8080/file.js", "dumpExceptionError", 41, 27),
            F("http://localhost:8080/file.js", "HTMLButtonElement.onclick", 107, 146),
            F("http://localhost:8080/file.js", "I.e.fn.(anonymous function) [as index]", 10, 3651),
        ],
        "stack",
    ),
    (
        "Chrome error with webpack URLs", "TypeError",
        "Cannot read property 'error' of undefined",
        "TypeError: Cannot read property 'error' of undefined\n"
        "   at TESTTESTTEST.eval(webpack:///./src/components/test/test.jsx?:295:108)\n"
        "   at TESTTESTTEST.render(webpack:///./src/components/test/test.jsx?:272:32)\n"
        "   at TESTTESTTEST.tryRender(webpack:///./~/react-transform-catch-errors/lib/index.js?:34:31)\n"
        "   at TESTTESTTEST.proxiedMethod(webpack:///./~/react-proxy/modules/createPrototypeProxy.js?:44:30)",
        False, "TypeError", "Cannot read property 'error' of undefined",
        [
            F("webpack:///./src/components/test/test.jsx?", "TESTTESTTEST.eval", 295, 108),
            F("webpack:///./src/components/test/test.jsx?", "TESTTESTTEST.render", 272, 32),
            F("webpack:///./~/react-transform-catch-errors/lib/index.js?", "TESTTESTTEST.tryRender", 34, 31),
            F("webpack:///./~/react-proxy/modules/createPrototypeProxy.js?", "TESTTESTTEST.proxiedMethod", 44, 30),
        ],
        "stack",
    ),
    (
        "Chrome 48 nested eval", "Error", "message string",
        "Error: message string\n"
        "at baz (eval at foo (eval at speak (http://localhost:8080/file.js:21:17)), <anonymous>:1:30)\n"
        "at foo (eval at speak (http://localhost:8080/file.js:21:17), <anonymous>:2:96)\n"
        "at eval (eval at speak (http://localhost:8080/file.js:21:17), <anonymous>:4:18)\n"
        "at Object.speak (http://localhost:8080/file.js:21:17)\n"
        "at http://localhost:8080/file.js:31:13\n",
        False, "Error", "message string",
        [
            F("http://localhost:8080/file.js", "baz", 21, 17),
            F("http://localhost:8080/file.js", "foo", 21, 17),
            F("http://localhost:8080/file.js", "eval", 21, 17),
            F("http://localhost:8080/file.js", "Object.speak", 21, 17),
            F("http://localhost:8080/file.js", U, 31, 13),
        ],
        "stack",
    ),
    (
        "Chrome 48 blob URLs", "Error", "Error: test",
        "Error: test\n"
        "    at Error (native)\n"
        "    at s (blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379:31:29146)\n"
        "    at Object.d [as add] (blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379:31:30039)\n"
        "    at blob:http%3A//localhost%3A8080/d4eefe0f-361a-4682-b217-76587d9f712a:15:10978\n"
        "    at blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379:1:6911\n"
        "    at n.fire (blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379:7:3019)\n"
        "    at n.handle (blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379:7:2863)",
        False, "Error", "Error: test",
        [
            F("(native)", "Error"),
            F("blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379", "s", 31, 29146),
            F("blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379", "Object.d [as add]", 31, 30039),
            F("blob:http%3A//localhost%3A8080/d4eefe0f-361a-4682-b217-76587d9f712a", U, 15, 10978),
            F("blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379", U, 1, 6911),
            F("blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379", "n.fire", 7, 3019),
            F("blob:http%3A//localhost%3A8080/abfc40e9-4742-44ed-9dcd-af8f99a29379", "n.handle", 7, 2863),
        ],
        "stack",
    ),
    (
        "Chrome error with no location (native)", "TypeError", "error",
        "error\n at Array.forEach (native)",
        False, "TypeError", "error",
        [F("(native)", "Array.forEach")],
        "stack",
    ),
    ("IE 9 error (no stack)", "TypeError",
     "Unable to get property 'undef' of undefined or null reference",
     "", True, None, None, None, None),
    (
        "IE 10 error", "TypeError",
        "Unable to get property 'undef' of undefined or null reference",
        "TypeError: Unable to get property 'undef' of undefined or null reference\n"
        "   at Anonymous function (http://path/to/file.js:48:13)\n"
        "   at foo (http://path/to/file.js:46:9)\n"
        "   at bar (http://path/to/file.js:82:1)",
        False, "TypeError", "Unable to get property 'undef' of undefined or null reference",
        [
            F("http://path/to/file.js", "Anonymous function", 48, 13),
            F("http://path/to/file.js", "foo", 46, 9),
            F("http://path/to/file.js", "bar", 82, 1),
        ],
        "stack",
    ),
    (
        "IE 11 error", "TypeError",
        "Unable to get property 'undef' of undefined or null reference",
        "TypeError: Unable to get property 'undef' of undefined or null reference\n"
        "   at Anonymous function (http://path/to/file.js:47:21)\n"
        "   at foo (http://path/to/file.js:45:13)\n"
        "   at bar (http://path/to/file.js:108:1)",
        False, "TypeError", "Unable to get property 'undef' of undefined or null reference",
        [
            F("http://path/to/file.js", "Anonymous function", 47, 21),
            F("http://path/to/file.js", "foo", 45, 13),
            F("http://path/to/file.js", "bar", 108, 1),
        ],
        "stack",
    ),
    (
        "IE 11 eval error", "ReferenceError", "'getExceptionProps' is undefined",
        "ReferenceError: 'getExceptionProps' is undefined\n"
        "   at eval code (eval code:1:1)\n"
        "   at foo (http://path/to/file.js:58:17)\n"
        "   at bar (http://path/to/file.js:109:1)",
        False, "ReferenceError", "'getExceptionProps' is undefined",
        [
            F("eval code", "eval code", 1, 1),
            F("http://path/to/file.js", "foo", 58, 17),
            F("http://path/to/file.js", "bar", 109, 1),
        ],
        "stack",
    ),
    (
        "Opera 9.64 error with function names", "Error",
        "Statement on line 42: Type mismatch (usually non-object value supplied where object required)\n"
        "Backtrace:\n"
        "  Line 42 of linked script http://path/to/file.js\n"
        "                this.undef();\n"
        "  Line 27 of linked script http://path/to/file.js\n"
        "            ex = ex || this.createException();\n"
        "  Line 18 of linked script http://path/to/file.js: In function printStackTrace\n"
        "        var p = new printStackTrace.implementation(), result = p.run(ex);\n"
        "  Line 4 of inline#1 script in http://path/to/file.js: In function bar\n"
        "             printTrace(printStackTrace());\n"
        "  Line 7 of inline#1 script in http://path/to/file.js: In function bar\n"
        "           bar(n - 1);\n"
        "  Line 11 of inline#1 script in http://path/to/file.js: In function foo\n"
        "           bar(2);\n"
        "  Line 15 of inline#1 script in http://path/to/file.js\n"
        "         foo();",
        "",
        False, "Error",
        "Statement on line 42: Type mismatch (usually non-object value supplied where object required)",
        [
            F("http://path/to/file.js", U, 42),
            F("http://path/to/file.js", U, 27),
            F("http://path/to/file.js", "printStackTrace", 18),
            F("http://path/to/file.js", "bar", 4),
            F("http://path/to/file.js", "bar", 7),
            F("http://path/to/file.js", "foo", 11),
            F("http://path/to/file.js", U, 15),
        ],
        "multiline",
    ),
    (
        "Opera 9 error", "TypeError",
        "Statement on line 44: Type mismatch\n"
        "Backtrace:\n"
        "  Line 44 of linked script http://path/to/file.js\n"
        "    this.undef();\n"
        "  Line 31 of linked script http://path/to/file.js\n"
        "    ex = ex || this.createException();",
        "",
        False, "TypeError", "Statement on line 44: Type mismatch",
        [
            F("http://path/to/file.js", U, 44),
            F("http://path/to/file.js", U, 31),
        ],
        "multiline",
    ),
    (
        "Opera 25 error", "TypeError", "Cannot read property 'undef' of null",
        "TypeError: Cannot read property 'undef' of null\n"
        "    at http://path/to/file.js:47:22\n"
        "    at foo (http://path/to/file.js:52:15)\n"
        "    at bar (http://path/to/file.js:108:168)",
        False, "TypeError", "Cannot read property 'undef' of null",
        [
            F("http://path/to/file.js", U, 47, 22),
            F("http://path/to/file.js", "foo", 52, 15),
            F("http://path/to/file.js", "bar", 108, 168),
        ],
        "stack",
    ),
    (
        "Opera 11 error", "Error", "'this.undef' is not a function",
        "Error thrown at line 42, column 12 in <anonymous function: createException>() in http://path/to/file.js:\n"
        "    this.undef();\n"
        "called from line 27, column 8 in <anonymous function: run>(ex) in http://path/to/file.js:\n"
        "    ex = ex || this.createException();\n"
        "called from line 18, column 4 in printStackTrace(options) in http://path/to/file.js:\n"
        "    var p = new printStackTrace.implementation(), result = p.run(ex);\n"
        "called from line 4, column 5 in bar(n) in http://path/to/file.js:\n"
        "    printTrace(printStackTrace());\n"
        "called from line 7, column 4 in bar(n) in http://path/to/file.js:\n"
        "    bar(n - 1);\n"
        "called from line 11, column 4 in foo() in http://path/to/file.js:\n"
        "    bar(2);\n"
        "called from line 15, column 3 in http://path/to/file.js:\n"
        "    foo();",
        False, "Error", "'this.undef' is not a function",
        [
            F("http://path/to/file.js", "createException", 42, 12),
            F("http://path/to/file.js", "run", 27, 8),
            F("http://path/to/file.js", "printStackTrace", 18, 4),
            F("http://path/to/file.js", "bar", 4, 5),
            F("http://path/to/file.js", "bar", 7, 4),
            F("http://path/to/file.js", "foo", 11, 4),
            F("http://path/to/file.js", U, 15, 3),
        ],
        "stacktrace",
    ),
    (
        "Opera 12 error", "Error", "Cannot convert 'x' to object",
        "Error thrown at line 48, column 12 in <anonymous function>(x) in http://localhost:8000/ExceptionLab.html:\n"
        "    x.undef();\n"
        "called from line 46, column 8 in dumpException3() in http://localhost:8000/ExceptionLab.html:\n"
        "    dumpException((function(x) {\n"
        "called from line 1, column 0 in <anonymous function>(event) in http://localhost:8000/ExceptionLab.html:\n"
        "    dumpException3();",
        False, "Error", "Cannot convert 'x' to object",
        [
            F("http://localhost:8000/ExceptionLab.html", "<anonymous function>", 48, 12),
            F("http://localhost:8000/ExceptionLab.html", "dumpException3", 46, 8),
            F("http://localhost:8000/ExceptionLab.html", "<anonymous function>", 1, 0),
        ],
        "stacktrace",
    ),
    (
        "Opera 10 error", "Error",
        "Statement on line 42: Type mismatch (usually non-object value supplied where object required)",
        "  Line 42 of linked script http://path/to/file.js\n"
        "                this.undef();\n"
        "  Line 27 of linked script http://path/to/file.js\n"
        "            ex = ex || this.createException();\n"
        "  Line 18 of linked script http://path/to/file.js: In function printStackTrace\n"
        "        var p = new printStackTrace.implementation(), result = p.run(ex);\n"
        "  Line 4 of inline#1 script in http://path/to/file.js: In function bar\n"
        "             printTrace(printStackTrace());\n"
        "  Line 7 of inline#1 script in http://path/to/file.js: In function bar\n"
        "           bar(n - 1);\n"
        "  Line 11 of inline#1 script in http://path/to/file.js: In function foo\n"
        "           bar(2);\n"
        "  Line 15 of inline#1 script in http://path/to/file.js\n"
        "         foo();\n",
        False, "Error",
        "Statement on line 42: Type mismatch (usually non-object value supplied where object required)",
        [
            F("http://path/to/file.js", U, 42),
            F("http://path/to/file.js", U, 27),
            F("http://path/to/file.js", "printStackTrace", 18),
            F("http://path/to/file.js", "bar", 4),
            F("http://path/to/file.js", "bar", 7),
            F("http://path/to/file.js", "foo", 11),
            F("http://path/to/file.js", U, 15),
        ],
        "stacktrace",
    ),
    (
        "PhantomJS 1.19 error", "Error", "foo",
        "Error: foo\n"
        "    at file:///path/to/file.js:878\n"
        "    at foo (http://path/to/file.js:4283)\n"
        "    at http://path/to/file.js:4287",
        False, "Error", "foo",
        [
            F("file:///path/to/file.js", U, 878),
            F("http://path/to/file.js", "foo", 4283),
            F("http://path/to/file.js", U, 4287),
        ],
        "stack",
    ),
    (
        "Android React Native error", "Error", "Error: test",
        "Error: test\n"
        "at render(/home/username/sample-workspace/sampleapp.collect.react/src/components/GpsMonitorScene.js:78:24)\n"
        "at _renderValidatedComponentWithoutOwnerOrContext(/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js:1050:29)\n"
        "at _renderValidatedComponent(/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js:1075:15)\n"
        "at renderedElement(/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js:484:29)\n"
        "at _currentElement(/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js:346:40)\n"
        "at child(/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactReconciler.js:68:25)\n"
        "at children(/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactMultiChild.js:264:10)\n"
        "at this(/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/native/ReactNativeBaseComponent.js:74:41)\n",
        False, "Error", "Error: test",
        [
            F("/home/username/sample-workspace/sampleapp.collect.react/src/components/GpsMonitorScene.js", "render", 78, 24),
            F("/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js", "_renderValidatedComponentWithoutOwnerOrContext", 1050, 29),
            F("/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js", "_renderValidatedComponent", 1075, 15),
            F("/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js", "renderedElement", 484, 29),
            F("/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactCompositeComponent.js", "_currentElement", 346, 40),
            F("/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactReconciler.js", "child", 68, 25),
            F("/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/shared/stack/reconciler/ReactMultiChild.js", "children", 264, 10),
            F("/home/username/sample-workspace/sampleapp.collect.react/node_modules/react-native/Libraries/Renderer/src/renderers/native/ReactNativeBaseComponent.js", "this", 74, 41),
        ],
        "stack",
    ),
    (
        "Android React Native Production error", "Error", "Error: test",
        "Error: test\n"
        "value@index.android.bundle:12:1917\n"
        "onPress@index.android.bundle:12:2336\n"
        "touchableHandlePress@index.android.bundle:258:1497\n"
        "[native code]\n"
        "_performSideEffectsForTransition@index.android.bundle:252:8508",
        False, "Error", "Error: test",
        [
            F("index.android.bundle", "value", 12, 1917),
            F("index.android.bundle", "onPress", 12, 2336),
            F("index.android.bundle", "touchableHandlePress", 258, 1497),
            F("[native code]", U),
            F("index.android.bundle", "_performSideEffectsForTransition", 252, 8508),
        ],
        "stack",
    ),
    (
        "React Native error with 'address at' prefix", "Error",
        "The Bufo shelter has denied your request due to excessive poking.",
        "Error: The Bufo shelter has denied your request due to excessive poking.\n"
        "    at anonymous (address at /Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle:1:2344117)\n"
        "    at anonymous (address at /Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle:1:2341114)\n"
        "    at anonymous (address at /Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle:1:2295518)\n"
        "    at call (native)\n"
        "    at apply (native)\n"
        "    at _with (address at /Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle:1:1414154)\n"
        "    at apply (native)\n"
        "    at _with (address at /Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle:1:1284269)",
        False, "Error", "The Bufo shelter has denied your request due to excessive poking.",
        [
            F("/Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle", "anonymous", 1, 2344117),
            F("/Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle", "anonymous", 1, 2341114),
            F("/Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle", "anonymous", 1, 2295518),
            F("(native)", "call"),
            F("(native)", "apply"),
            F("/Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle", "_with", 1, 1414154),
            F("(native)", "apply"),
            F("/Users/username/Library/Developer/CoreSimulator/Devices/DEVICE-UUID/data/Containers/Bundle/Application/APP-UUID/Example.app/main.jsbundle", "_with", 1, 1284269),
        ],
        "stack",
    ),
    (
        "Chrome/V8 format with anonymous functions", "Error", "",
        "  Error: \n"
        "    at new <anonymous> (http://example.com/js/test.js:63:1)\n"
        "    at namedFunc0 (http://example.com/js/script.js:10:2)\n"
        "    at http://example.com/js/test.js:65:10\n"
        "    at namedFunc2 (http://example.com/js/script.js:20:5)\n"
        "    at http://example.com/js/test.js:67:5\n"
        "    at namedFunc4 (http://example.com/js/script.js:100001:10002)",
        False, "Error", "",
        [
            F("http://example.com/js/test.js", "new <anonymous>", 63, 1),
            F("http://example.com/js/script.js", "namedFunc0", 10, 2),
            F("http://example.com/js/test.js", U, 65, 10),
            F("http://example.com/js/script.js", "namedFunc2", 20, 5),
            F("http://example.com/js/test.js", U, 67, 5),
            F("http://example.com/js/script.js", "namedFunc4", 100001, 10002),
        ],
        "stack",
    ),
    (
        "Stack trace with native frames", "Error", "Test error",
        "Error: Test error\n"
        "   at Array.map (native)\n"
        "   at funcA (fileA.js:10:15)\n"
        "   at Array.forEach (native)\n"
        "   at funcB (fileB.js:20:25)",
        False, "Error", "Test error",
        [
            F("(native)", "Array.map"),
            F("fileA.js", "funcA", 10, 15),
            F("(native)", "Array.forEach"),
            F("fileB.js", "funcB", 20, 25),
        ],
        "stack",
    ),
    ("Empty stack trace", "Error", "Error message", "", True, None, None, None, None),
    ("Unparseable stack trace", "Error", "Error message",
     "This is not a valid stack trace format\nSome random text\nMore random text",
     True, None, None, None, None),
    (
        "Chrome with query string URL", "Error", "Test error",
        "Error: Test error\n"
        "    at foo (http://example.com/file.js?v=123:10:5)\n"
        "    at bar (http://example.com/file.js?v=123&debug=true:20:10)",
        False, "Error", "Test error",
        [
            F("http://example.com/file.js?v=123", "foo", 10, 5),
            F("http://example.com/file.js?v=123&debug=true", "bar", 20, 10),
        ],
        "stack",
    ),
    (
        "Chrome with fragment URL", "Error", "Test error",
        "Error: Test error\n"
        "    at foo (http://example.com/file.js#section:10:5)\n"
        "    at bar (http://example.com/file.js#top:20:10)",
        False, "Error", "Test error",
        [
            F("http://example.com/file.js#section", "foo", 10, 5),
            F("http://example.com/file.js#top", "bar", 20, 10),
        ],
        "stack",
    ),
    (
        "Chrome extension error", "Error", "Extension error",
        "Error: Extension error\n"
        "    at foo (chrome-extension://abc123def456/script.js:10:5)\n"
        "    at bar (chrome-extension://abc123def456/background.js:20:10)",
        False, "Error", "Extension error",
        [
            F("chrome-extension://abc123def456/script.js", "foo", 10, 5),
            F("chrome-extension://abc123def456/background.js", "bar", 20, 10),
        ],
        "stack",
    ),
    (
        "Incomplete URL due to missing closing paren", "Error", "Test error",
        "Error: Test error\n"
        "    at func (http://example.com/file.js:10:5\n"
        "    at func2 (http://example.com/file2.js:20:1)",
        False, "Error", "Test error",
        [
            F("http://example.com/file.js", "func", 10, 5),
            F("http://example.com/file2.js", "func2", 20, 1),
        ],
        "stack",
    ),
    (
        "non-numeric line number", "Error", "Test error",
        "Error: Test error\n"
        "    at func (http://example.com/file.js:abc:5)\n"
        "    at func2 (http://example.com/file2.js:20:1)",
        False, "Error", "Test error",
        [
            F("http://example.com/file.js:abc", "func", 5, None),
            F("http://example.com/file2.js", "func2", 20, 1),
        ],
        "stack",
    ),
    (
        "non-numeric column number", "Error", "Test error",
        "Error: Test error\n"
        "    at func (http://example.com/file.js:10:xyz)\n"
        "    at func2 (http://example.com/file2.js:20:1)",
        False, "Error", "Test error",
        [
            F("http://example.com/file.js:10:xyz", "func", None, None),
            F("http://example.com/file2.js", "func2", 20, 1),
        ],
        "stack",
    ),
    (
        "Line and column numbers at zero", "Error", "Test error",
        "Error: Test error\n"
        "    at func (http://example.com/file.js:0:1)\n"
        "    at func2 (http://example.com/file.js:1:0)",
        False, "Error", "Test error",
        [
            F("http://example.com/file.js", "func", 0, 1),
            F("http://example.com/file.js", "func2", 1, 0),
        ],
        "stack",
    ),
    (
        "Line and column at max uint32", "Error", "Test error",
        "Error: Test error\n"
        f"    at func (http://example.com/file.js:{MAX_U32}:{MAX_U32})",
        False, "Error", "Test error",
        [F("http://example.com/file.js", "func", MAX_U32, MAX_U32)],
        "stack",
    ),
    (
        "Chrome error with anonymous url", "Error", "test error",
        "Error: test error\n"
        "    at JSON.parse (<anonymous>)\n"
        "    at foo (http://example.com/bundle.js:1:100)\n"
        "    at async http://example.com/bundle.js:1:200",
        False, "Error", "test error",
        [
            F("<anonymous>", "JSON.parse"),
            F("http://example.com/bundle.js", "foo", 1, 100),
            F("http://example.com/bundle.js", "async", 1, 200),
        ],
        "stack",
    ),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_js_stack_parser(case):
    name, exc_name, exc_msg, stack, expect_error, exp_name, exp_msg, frames, mode = case

    if expect_error:
        with pytest.raises(JsParseError):
            compute_stack_trace(exc_name, exc_msg, stack)
        return

    result = compute_stack_trace(exc_name, exc_msg, stack)
    assert result.name == exp_name
    assert result.message == exp_msg
    assert result.mode == mode
    got = [(f.url, f.func_name, f.line, f.column) for f in result.frames]
    assert got == frames
