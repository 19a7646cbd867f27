"""Shared versioned-state helpers for the foreachBatch maintenance
modules (counter/m4/ohlc/rollup/dsir/gram/correlation/heavyhitters/
bloom/coverage).

Commit scheme: each processed micro-batch writes its full state under
``state_dir/v=<batch_id>/`` and readers take the highest committed
version — so a REPLAYED batch (same id redelivered after a failure,
the only redelivery Structured Streaming performs) is a no-op.

Replay vs regression (ADVICE r05): if the streaming CHECKPOINT dir is
deleted/recreated while ``state_dir`` persists, batch ids restart at 0
and every new batch would look like a replay — the old ``vs[-1] >=
batch_id`` guard then silently dropped ALL new data forever. The guard
now distinguishes the two: an id EQUAL to the committed head is a
legitimate redelivery (skip); an id BELOW it is a checkpoint/state
identity mismatch and raises instead of no-oping.
"""

from __future__ import annotations

import os


def committed_versions(
    state_dir: str, markers: tuple[str, ...] = ("",)
) -> list[int]:
    """Committed state versions under ``state_dir``: every ``v=<id>``
    directory whose required ``markers`` sub-paths all carry a parquet
    ``_SUCCESS`` (marker ``""`` = the version dir itself). Shared by
    every foreachBatch maintenance module (ADVICE r06: 13 copies had
    drifted apart only in which sub-writes must have committed) — a
    module with multiple per-version writes lists each sub-dir, e.g.
    ``("buckets", "last")`` for the counter state, so a version whose
    second write never landed is invisible to readers."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if not d.startswith("v="):
            continue
        try:
            vid = int(d.split("=", 1)[1])
        except ValueError:  # leftover temp / foreign dir (ADVICE r10)
            continue
        if all(
            os.path.exists(os.path.join(state_dir, d, m, "_SUCCESS"))
            for m in markers
        ):
            out.append(vid)
    return sorted(out)


def replay_guard(vs: list[int], batch_id: int, state_dir: str) -> bool:
    """Return True when ``batch_id`` is a redelivery of the committed
    head (caller skips the batch); raise when it REGRESSES below the
    head — that means the stream's checkpoint was deleted or points at
    a different source while ``state_dir`` kept its history, and
    continuing would silently drop every future batch."""
    if not vs:
        return False
    head = vs[-1]
    if batch_id < head:
        raise RuntimeError(
            f"streaming state at {state_dir!r} has committed version "
            f"{head} but received batch_id {batch_id}: the query's "
            "checkpoint dir was likely deleted/recreated (batch ids "
            "restart at 0) while the state dir persisted. Refusing to "
            "no-op — restart with a fresh state_dir or restore the "
            "original checkpoint."
        )
    return batch_id == head


def committed_batch_dirs(state_dir: str) -> list[str]:
    """Absolute paths of the ``batch=N`` partial dirs under
    ``state_dir`` whose parquet write COMMITTED (``_SUCCESS`` present) —
    the additive-partial twin of :func:`committed_versions` (ADVICE
    r09): a torn ``batch=N`` write from a crashed micro-batch stays
    invisible to the serving path until that batch's replay overwrites
    it. Sorted by batch id for deterministic read order. Entries whose
    ``batch=`` suffix is not an integer (a leftover temp or foreign
    dir) are skipped rather than failing every read (ADVICE r10)."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if not d.startswith("batch="):
            continue
        try:
            bid = int(d.split("=", 1)[1])
        except ValueError:
            continue
        if os.path.exists(os.path.join(state_dir, d, "_SUCCESS")):
            out.append((bid, d))
    out.sort()
    return [os.path.join(state_dir, d) for _, d in out]
