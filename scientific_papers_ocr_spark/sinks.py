"""Rate-limited batched sink: the S13 (Notion uploader) analog.

The reference pushes assembled documents to an external HTTP API in batches,
sleeping between requests to respect the service's rate limit
(notion_interface/notion_page_handler.py:107-123 batches block appends,
:175-179 sleeps between page creations).  The Spark-native shape of that
pattern is ``foreachPartition`` + a client-side token bucket per partition
task: rows stream out of the iterator in bounded batches and each batch
acquires tokens before the transport call, so executor-side backpressure
never buffers the whole partition.

Scale note: the bucket limits each partition *task*; an account-wide budget
must be divided by the number of concurrent tasks (``rate_per_sec / slots``),
or the DataFrame coalesced to 1 partition for a strict global limit (which is
what the single-process reference effectively does).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator


class TokenBucket:
    """Deterministic token bucket: ``rate_per_sec`` refill, ``burst`` cap.

    ``clock``/``sleep`` are injectable for testing; production uses
    ``time.monotonic``/``time.sleep``.
    """

    def __init__(
        self,
        rate_per_sec: float,
        burst: float | None = None,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if rate_per_sec <= 0:
            raise ValueError("rate_per_sec must be positive")
        self.rate = float(rate_per_sec)
        self.capacity = float(burst if burst is not None else rate_per_sec)
        self.tokens = self.capacity
        self._clock = clock
        self._sleep = sleep
        self._last = clock()

    def _refill(self) -> None:
        now = self._clock()
        self.tokens = min(self.capacity, self.tokens + (now - self._last) * self.rate)
        self._last = now

    def acquire(self, n: float = 1.0) -> None:
        """Block (sleep) until ``n`` tokens are available, then take them."""
        if n > self.capacity:
            raise ValueError(f"cannot acquire {n} > burst capacity {self.capacity}")
        self._refill()
        if self.tokens < n:
            self._sleep((n - self.tokens) / self.rate)
            self._refill()
            # after sleeping exactly the deficit, tokens may be epsilon short
            # of n under a coarse clock; clamp rather than spin
            self.tokens = max(self.tokens, n)
        self.tokens -= n


def _batches(rows: Iterator, batch_size: int) -> Iterator[list]:
    batch: list = []
    for row in rows:
        batch.append(row)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def write_rate_limited(
    df,
    transport: Callable[[list[dict]], None],
    rate_per_sec: float = 3.0,
    batch_size: int = 10,
    bucket_factory: Callable[[], TokenBucket] | None = None,
) -> None:
    """Stream ``df`` to ``transport`` in rate-limited batches.

    ``transport`` runs on executors — it must be picklable and side-effect
    its own destination (HTTP client, file, queue).  One token bucket per
    partition task; one token per batch (the reference's one-request-per-
    batch accounting).
    """

    def handle_partition(rows: Iterable) -> None:
        bucket = (
            bucket_factory() if bucket_factory is not None
            else TokenBucket(rate_per_sec)
        )
        for batch in _batches(iter(rows), batch_size):
            bucket.acquire(1.0)
            transport([r.asDict() if hasattr(r, "asDict") else dict(r) for r in batch])

    df.foreachPartition(handle_partition)
