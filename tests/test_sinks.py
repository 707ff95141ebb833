"""Rate-limited batched sink (S13 analog): token-bucket pacing semantics with
an injected clock, and end-to-end delivery through foreachPartition behind a
no-op (filesystem) transport."""

import glob
import json
import os
import uuid

from scientific_papers_ocr_spark import sinks


class FakeClock:
    def __init__(self):
        self.now = 0.0
        self.sleeps = []

    def __call__(self):
        return self.now

    def sleep(self, s):
        self.sleeps.append(s)
        self.now += s


class TestTokenBucket:
    def test_burst_then_throttle(self):
        clk = FakeClock()
        b = sinks.TokenBucket(rate_per_sec=2.0, burst=2.0, clock=clk, sleep=clk.sleep)
        b.acquire()          # burst token 1, no sleep
        b.acquire()          # burst token 2, no sleep
        assert clk.sleeps == []
        b.acquire()          # bucket empty -> must wait 1/rate
        assert clk.sleeps == [0.5]
        b.acquire()
        assert clk.sleeps == [0.5, 0.5]

    def test_refill_caps_at_burst(self):
        clk = FakeClock()
        b = sinks.TokenBucket(rate_per_sec=10.0, burst=3.0, clock=clk, sleep=clk.sleep)
        clk.now += 100.0     # long idle: refill must cap at burst, not 1000
        b.acquire(3.0)
        assert clk.sleeps == []
        b.acquire(1.0)
        assert clk.sleeps == [0.1]

    def test_acquire_over_capacity_rejected(self):
        import pytest

        b = sinks.TokenBucket(rate_per_sec=1.0, burst=2.0)
        with pytest.raises(ValueError):
            b.acquire(5.0)


class TestWriteRateLimited:
    def test_delivers_all_rows_in_bounded_batches(self, spark, tmp_path):
        out_dir = str(tmp_path / "sent")
        os.makedirs(out_dir, exist_ok=True)

        def transport(batch):
            # no-op transport stand-in: one file per request
            path = os.path.join(out_dir, f"{uuid.uuid4().hex}.json")
            with open(path, "w") as f:
                json.dump(batch, f)

        df = spark.range(0, 57).selectExpr("id", "id * 2 AS payload").repartition(4)
        sinks.write_rate_limited(
            df, transport, rate_per_sec=10_000.0, batch_size=10
        )

        batches = [json.load(open(p)) for p in glob.glob(f"{out_dir}/*.json")]
        assert all(1 <= len(b) <= 10 for b in batches)
        got = sorted(row["id"] for b in batches for row in b)
        assert got == list(range(57))
        assert all(
            row["payload"] == row["id"] * 2 for b in batches for row in b
        )
