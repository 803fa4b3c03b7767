"""Name → factory registry.

The reference resolves datasets/models/agents from YAML strings by
reflection (``utils/loader.py:20-198`` / ``get_module``).  We keep the
same public names but use an explicit registry instead of import-time
reflection: a registry is jit-friendly (no dynamic imports inside traced
code), greppable, and lets several names alias one implementation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Callable[..., Any]]] = {
    "dataset": {},
    "model": {},
    "agent": {},
}


def register(kind: str, *names: str) -> Callable[[Callable], Callable]:
    """Decorator: register ``fn_or_cls`` under each of ``names``."""

    def deco(fn_or_cls: Callable) -> Callable:
        table = _REGISTRIES[kind]
        for name in names:
            if name in table:
                raise KeyError(f"duplicate {kind} registration: {name!r}")
            table[name] = fn_or_cls
        return fn_or_cls

    return deco


def get(kind: str, name: str) -> Callable[..., Any]:
    table = _REGISTRIES[kind]
    try:
        return table[name]
    except KeyError:
        known = ", ".join(sorted(table))
        raise KeyError(f"unknown {kind} {name!r}; known: {known}") from None


def names(kind: str):
    return sorted(_REGISTRIES[kind])
