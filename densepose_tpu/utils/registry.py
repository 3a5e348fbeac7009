"""Minimal string->object registry + dotted-path locate.

Equivalent surface to detectron2/utils/registry.py (Registry, locate) used
by every build_* dispatch; implemented without fvcore.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Any] = {}

    def register(self, name_or_obj=None, obj: Any = None):
        """Either ``reg.register("name", obj)``, or decorator usage:
        ``@reg.register()`` / ``@reg.register`` (uses __name__)."""
        if obj is not None:
            self._register(name_or_obj, obj)
            return obj
        if callable(name_or_obj) and not isinstance(name_or_obj, str):
            self._register(name_or_obj.__name__, name_or_obj)
            return name_or_obj
        if isinstance(name_or_obj, str):
            # register("name", value) handled above; here it's two-arg via
            # positional: register(name, value) with value in obj — or a
            # named decorator
            def deco(fn):
                self._register(name_or_obj, fn)
                return fn
            return deco

        def deco(fn):
            self._register(fn.__name__, fn)
            return fn
        return deco

    def _register(self, name: str, obj: Any):
        if name in self._map:
            raise KeyError(f"{name!r} already registered in {self._name}")
        self._map[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._map:
            raise KeyError(
                f"{name!r} not found in {self._name} registry; "
                f"available: {sorted(self._map)}")
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map

    def keys(self):
        return self._map.keys()


def locate(name: str) -> Any:
    """Resolve a dotted path like ``package.module.attr``."""
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:i]))
        except ModuleNotFoundError:
            continue
        obj = mod
        for attr in parts[i:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"Cannot locate {name!r}")
