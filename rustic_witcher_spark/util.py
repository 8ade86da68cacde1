"""Small shared utilities (reference parity: rustic-duration)."""

from __future__ import annotations


def beautify_duration(seconds: float) -> str:
    """Sub-second durations as ms, otherwise whole seconds
    (ref: rustic-duration/src/lib.rs:1-11)."""
    ms = int(seconds * 1000)
    if ms < 1000:
        return f"{ms}ms"
    return f"{int(seconds)}s"
