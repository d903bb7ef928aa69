"""pcommon.Map-equivalent helpers over plain dict attribute maps."""

from __future__ import annotations

from typing import Any


def get_str(attrs: dict, key: str) -> tuple[str, bool]:
    """attributes.Get(key) + Value.Str(): wrong-typed values read as ""."""
    if key not in attrs:
        return "", False
    v = attrs[key]
    return (v, True) if isinstance(v, str) else ("", True)


def get_slice(attrs: dict, key: str) -> tuple[list, bool]:
    """getSlice (sourcemapprocessor/processor.go:393-401): missing key ->
    ([], False); present non-slice values read as an empty slice."""
    if key not in attrs:
        return [], False
    v = attrs[key]
    return (v, True) if isinstance(v, list) else ([], True)


def value_int(v: Any) -> int:
    """Value.Int(): non-int typed values read as 0 (bools are not ints
    in pdata)."""
    if isinstance(v, bool) or not isinstance(v, int):
        return 0
    return v


def value_str(v: Any) -> str:
    return v if isinstance(v, str) else ""


def is_language_allowed(language: str, allowed: list[str]) -> bool:
    """Case-insensitive membership (sourcemapprocessor/processor.go:405-413)."""
    language = language.lower()
    return any(a.lower() == language for a in allowed)


def language_gate(attrs: dict, resource_attrs: dict, language_key: str, allowed: list[str]) -> bool:
    """Operator G4: returns True when processing should continue.  With a
    non-empty allowlist, a missing language attribute means skip
    (sourcemapprocessor/processor.go:127-143 and twins)."""
    if not allowed:
        return True
    if language_key in attrs:
        lang = value_str(attrs[language_key])
    elif language_key in resource_attrs:
        lang = value_str(resource_attrs[language_key])
    else:
        return False
    return is_language_allowed(lang, allowed)
