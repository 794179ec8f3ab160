"""Namespace utilities and entity constructors (pure Python, planner-side).

Parity targets: ``reverse_lookup`` (/root/reference/tripl/tripl.py:274-278),
``some`` (:44-56), ``entity_cons``/``namespaced`` (:745-759),
``get_in`` path access (:203-227 Entity.get_in semantics).
"""

from __future__ import annotations

from typing import Any

SCALAR_TYPES = (str, bytes, int, float, bool)


def reverse_lookup(attr_name: str) -> str | None:
    """If ``attr_name`` is a reverse-lookup attr (``ns:_name``), return the
    forward attr (``ns:name``); else None."""
    parts = attr_name.split(":")
    if parts[-1] and parts[-1][0] == "_":
        parts[-1] = parts[-1][1:]
        return ":".join(parts)
    return None


def some(xs: Any, default: Any = None) -> Any:
    """First element of a collection, or the value itself if scalar/dict.

    Multi-valued results in this engine are canonical (sorted) lists, so
    unlike the reference's arbitrary set pick this is deterministic.
    """
    if isinstance(xs, SCALAR_TYPES) or isinstance(xs, dict):
        return xs
    try:
        return next(iter(xs))
    except TypeError:
        return xs if xs is not None else default
    except StopIteration:
        return default


def get_in(data: Any, path: list[str], default: Any = None) -> Any:
    """Recursive path navigation over pulled documents, flattening
    multi-valued hops (reference Entity.get_in semantics)."""
    if not path:
        return data
    key, rest = path[0], path[1:]
    if isinstance(data, dict):
        return get_in(data.get(key, default), rest and rest or [], default) if rest else data.get(key, default)
    if isinstance(data, (list, set, tuple)):
        out = []
        for item in data:
            got = get_in(item, path, default)
            if isinstance(got, (list, set, tuple)):
                out.extend(got)
            elif got is not None:
                out.append(got)
        return out
    return default


def entity_cons(type_name: str, default_attr_base: str):
    """Factory producing namespaced entity dicts, tagging
    ``<prefix>:type`` with ``type_name`` (reference tripl.py:745-753)."""

    def cons(**avs: Any) -> dict[str, Any]:
        out = {
            (default_attr_base + ":" + k if ":" not in k else k): v for k, v in avs.items()
        }
        out[type_name.split(".")[0] + ":type"] = type_name
        return out

    return cons


def namespaced(namespace: str, **avs: Any) -> dict[str, Any]:
    """Prefix un-namespaced keys with ``namespace:`` (reference tripl.py:756-759)."""
    return {(namespace + ":" + k if ":" not in k else k): v for k, v in avs.items()}
