"""Registry for lazy-return cache pins with an explicit release handle.

The cache-lifetime convention (see ``pipeline/dedup.py`` module docs):
operators whose RETURNED frame reads a shared intermediate from several
plan branches (``sh``/``fp``/``sig``/``ph``) pin it with ``.cache()`` and
cannot unpersist before returning — the caller's action is what populates
and consumes the pin. bench.py handles this with a blanket
``spark.catalog.clearCache()`` between queries, but a long-lived session
composing many operator calls had no way to release the pins it
accumulated (VERDICT r11 carried item). This registry is that release
handle: operators route their pin through :func:`pin`, and a session
calls :func:`release_pins` between logical jobs.

``release_pins`` is deliberately coarse (drop every registered pin): the
pins are narrow hash/id projections that rebuild in one pass, so the
safe points to call it are exactly the points where no returned frame is
still being consumed — same contract ``clearCache()`` already imposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINS: list[DataFrame] = []


def _is_cached(df: DataFrame) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def pin(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the pinned frame for :func:`release_pins`.

    Registration first PRUNES entries that are no longer cached (a session
    that resets with ``spark.catalog.clearCache()`` — bench.py does per
    query — would otherwise grow the registry by one plan object per
    operator call forever; pruning bounds it to the live pins)."""
    _PINS[:] = [d for d in _PINS if _is_cached(d)]
    df = df.cache()
    _PINS.append(df)
    return df


def release_pins() -> int:
    """Unpersist every registered pin; returns how many were released.

    Non-blocking (the executors drop blocks asynchronously). Safe to call
    when no operator-returned frame is mid-consumption; pins for frames
    that are consumed again later simply recompute and re-populate.
    """
    n = 0
    for df in _PINS:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    _PINS.clear()
    return n
