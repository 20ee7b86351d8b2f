"""Scalar/table-function subpackage — submodules resolve lazily (PEP 562),
for the same per-process import-closure reason as ``operators/__init__``:
a worker or runner process that references one module must not pay for
the heavy siblings (``tablefuncs`` imports pandas at call sites; ``bpe``/
``text``/``classifier`` are large expression builders)."""

import importlib

__all__ = [
    "bpe",
    "classifier",
    "lm",
    "parsing",
    "tablefuncs",
    "text",
    "vectors",
]


def __getattr__(name: str):
    if name in __all__:
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))
