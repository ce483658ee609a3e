"""Exponential retry backoff with jitter (F7).

Semantics match the reference policy: ``min(cap, base * 2^attempt)`` with a
uniform jitter *subtracted* as a percentage of the backoff, overflow-safe by
computing the exponential in floating point
(reference: scylla-cdc-base/.../model/ExponentialRetryBackoffWithJitter.java:43-51;
defaults 50 ms -> 30 s, 20% jitter: WorkerConfiguration.java:17-18).

Driver-side only: Spark's own task retry handles executor-side failures; this
policy is used by the streaming consumer's planning loop.
"""

from __future__ import annotations

import random


class ExponentialRetryBackoffWithJitter:
    def __init__(
        self,
        base_ms: int = 50,
        cap_ms: int = 30_000,
        jitter_percent: int = 20,
        rng: random.Random | None = None,
    ) -> None:
        if base_ms <= 0 or cap_ms <= 0 or not (0 <= jitter_percent <= 100):
            raise ValueError("invalid backoff configuration")
        self.base_ms = base_ms
        self.cap_ms = cap_ms
        self.jitter_percent = jitter_percent
        self._rng = rng or random.Random()

    def backoff_ms(self, attempt: int) -> int:
        exp = float(self.base_ms) * (2.0 ** attempt)
        backoff = min(float(self.cap_ms), exp)
        jitter = self._rng.uniform(0.0, self.jitter_percent / 100.0) * backoff
        return int(backoff - jitter)
