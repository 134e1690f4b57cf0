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
    copies onto disk permanently.

    The atexit removal is best-effort (a SIGKILLed session never runs
    it), so the first call of a session also SWEEPS siblings left by
    dead sessions (VERDICT r15 item 7: ~90 MB of orphans had
    accumulated across rounds). Ownership is a pidfile: each scratch
    carries .owner_pid; a sibling whose pid is gone is sweepable, a
    live one is left alone (concurrent pytest + driver sessions
    coexist). Legacy appId-patterned dirs with no pidfile are swept
    too; anything else under the workspace (the codebooks store) is
    durable and untouched. Every session-parquet consumer is
    self-healing on a vanished path, so a mis-sweep of a live legacy
    dir costs a rebuild, not correctness."""
    import atexit
    import os
    import shutil

    base = os.path.join(_workspace_dir(), spark.sparkContext.applicationId)
    if base not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(base)
        atexit.register(shutil.rmtree, base, True)
        _sweep_dead_sessions(base)
        os.makedirs(base, exist_ok=True)
        with open(os.path.join(base, ".owner_pid"), "w") as fh:
            fh.write(str(os.getpid()))
    return base


def materialize_once(spark: SparkSession, name: str, write) -> str:
    """Session-scoped materialize-once under the scratch dir: calls
    `write(path)` unless the path already carries Spark's task-commit
    _SUCCESS marker, and returns the path. ONE commit convention for
    every format export (r16 review: the roundtrip jobs hand-rolled a
    private _WRITTEN marker next to the _SUCCESS the Hadoop committer
    already publishes, in a thrice-copied check/write/stamp block).
    _SUCCESS is atomic with the committed data — a crashed write
    leaves no marker and the next session (or retry) rewrites."""
    import os

    out = os.path.join(session_scratch(spark), name)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        write(out)
    return out


def _sweep_dead_sessions(current: str) -> None:
    """Remove sibling scratch dirs whose owning process is dead: a
    pidfile with a gone pid, or a legacy appId-patterned dir with no
    pidfile at all. PermissionError from kill(pid, 0) means ALIVE
    (another user's process) — kept."""
    import os
    import re
    import shutil

    ws = os.path.dirname(current)
    try:
        entries = os.listdir(ws)
    except FileNotFoundError:
        return
    for name in entries:
        path = os.path.join(ws, name)
        if path == current or not os.path.isdir(path):
            continue
        try:
            with open(os.path.join(path, ".owner_pid")) as fh:
                pid = int(fh.read().strip())
        except (OSError, ValueError):
            if re.fullmatch(r"(local|app)-[\w.-]+", name):
                shutil.rmtree(path, True)
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(path, True)
        except OSError:
            pass
