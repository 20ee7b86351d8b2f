"""Operator subpackage — submodules resolve lazily (PEP 562).

Eager imports here would make EVERY process that touches one operator
module pay for ALL of them: the Python streaming-source runner Spark
spawns per stream start (a fresh interpreter) unpickles the manifest-feed
reader, which needs only ``operators.transactional`` — but an eager
package ``__init__`` would drag ``multimodal`` (and with it pandas +
numpy, ~0.5 s of import) into that spawn, and into every executor-side
Python worker's first task. Lazy resolution keeps each process's import
closure at exactly what it references; ``from ...operators import x``
still works (the import system falls back to submodule import through
``__getattr__``).
"""

import importlib

__all__ = [
    "dedup",
    "geo",
    "joins",
    "maintenance",
    "metastore",
    "multimodal",
    "relational",
    "similarity",
    "sketches",
    "sqldml",
    "transactional",
]


def __getattr__(name: str):
    if name in __all__:
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))
