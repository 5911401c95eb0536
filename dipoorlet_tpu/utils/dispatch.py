"""Keyed function tables for the calibration-algorithm and deploy-emitter
registries (the role of the reference's decorator util, utils.py:281-303,
rebuilt as a plain mapping type)."""
from __future__ import annotations

from typing import Callable, Dict, Optional


class Registry:
    """A name -> handler table invoked as ``registry(key, *args, **kw)``.

    Unknown keys route to the ``missing`` handler (which may raise, warn,
    or provide a generic implementation).  Handlers attach via the
    ``add`` decorator::

        emitters = Registry("deploy", missing=warn_unknown)

        @emitters.add("trt")
        def emit_trt(graph, ranges, args): ...
    """

    def __init__(self, name: str, missing: Optional[Callable] = None):
        self.name = name
        self.missing = missing
        self.table: Dict[str, Callable] = {}

    def add(self, key: str):
        def deco(fn: Callable) -> Callable:
            self.table[key] = fn
            return fn
        return deco

    def __contains__(self, key: str) -> bool:
        return key in self.table

    def keys(self):
        return self.table.keys()

    def __call__(self, key: str, *args, **kwargs):
        fn = self.table.get(key)
        if fn is None:
            if self.missing is None:
                raise KeyError(f"{self.name}: no handler for {key!r}")
            return self.missing(*args, **kwargs)
        return fn(*args, **kwargs)
