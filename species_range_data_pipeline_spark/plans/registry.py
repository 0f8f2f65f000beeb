"""Aggregates every plan module's QUERIES/ORACLES for the driver contract."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULE_NAMES = [
    "relational",
    "tpch_extra",
    "advanced",
    "stats",
    "mining",
    "quality",
    "scalar",
    "text",
    "bpe",
    "packing",
    "retrieval",
    "vectors",
    "events",
    "media",
    "geo",
    "graph",
]


def _modules():
    import importlib

    mods = []
    for name in _MODULE_NAMES:
        try:
            mods.append(importlib.import_module(f"{__package__}.{name}"))
        except ModuleNotFoundError:
            continue  # module not built yet; registry stays partial
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r}")
            queries[name] = fn
    return queries


def all_oracles() -> dict[str, str]:
    oracles: dict[str, str] = {}
    for mod in _modules():
        oracles.update(getattr(mod, "ORACLES", {}))
    return oracles
