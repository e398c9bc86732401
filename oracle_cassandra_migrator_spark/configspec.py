"""Shared strict parsers for JSON-ish pipeline/source specs.

Config specs arrive from JSON files, CLI args, and hand-written dicts,
so boolean flags show up both as JSON true/false and as the string
forms config authors write. Plain ``bool()`` turns ``"false"`` into
True — for flags that loosen a safety default (``allow_missing``) or
trigger an expensive rewrite (``layout.refresh``), that silent
inversion is exactly the drift the strict parse exists to catch
(ADVICE r8/r9)."""

from __future__ import annotations

from typing import Any


def spec_bool(value: Any, key: str) -> bool:
    """Parse a spec boolean strictly: JSON true/false, or the string
    forms "true"/"false" (any case). Anything else raises."""
    if isinstance(value, bool):
        return value
    if isinstance(value, str) and value.lower() in ("true", "false"):
        return value.lower() == "true"
    raise ValueError(
        f"{key!r} must be true/false (got {value!r})")
