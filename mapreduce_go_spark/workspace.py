"""Session workspace: the directory the engine owns for materialized
layouts and the per-application scratch under it.

Extracted from operators/joins.py in r15 — the bucketed-layout helper
was the first materialization and the symbols grew into engine-wide
infrastructure that media caches, WARC sinks, format-roundtrip
exports, pruning layouts and the k-means codebook store all imported
from an OPERATOR module through deferred intra-function imports (the
layering inversion the r15 review flagged). This module has no
operator dependencies, so every consumer can import it at the top
level.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_CLEANUP_REGISTERED: set[str] = set()


def _workspace_dir() -> str:
    """Directory the engine owns for materialized layouts:
    $SPARK_GRAFT_WORKSPACE, else <repo>/.bucketed_cache. NOT the OS
    temp dir — tmp cleaners delete long-lived session files out from
    under the catalog (the advisory's failure mode)."""
    import os
    import pathlib

    return os.environ.get(
        "SPARK_GRAFT_WORKSPACE",
        str(pathlib.Path(__file__).resolve().parents[1] / ".bucketed_cache"),
    )


def session_scratch(spark: SparkSession) -> str:
    """Per-application scratch directory under the workspace, removed
    at interpreter exit. EVERY session-lifetime materialization
    (bucketed layouts, the partitioned events copy, format-roundtrip
    exports) must live under this path: before r11 the jsonl/orc/csv/
    events_by_day copies were appId-tagged at the workspace ROOT and
    never cleaned, so every pytest/bench/driver session leaked its
    copies onto disk permanently."""
    import atexit
    import os
    import shutil

    base = os.path.join(_workspace_dir(), spark.sparkContext.applicationId)
    if base not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(base)
        atexit.register(shutil.rmtree, base, True)
    return base
