"""Hot-key streaming sessionization bench: one key streams millions of
events inside a single never-idle session (the adversarial shape for
streaming state — reference lesson P4, flow_table.rs:24: state must hold
accumulators, never raw events).

With the round-5 O(1) accumulator state, per-key state holds the FlowAccum
plus only the raw events inside the watermark horizon, independent of how
long the session has been open; each micro-batch folds its below-watermark
prefix into the accumulator instead of re-segmenting the whole session.

Usage: python tools/bench_hotkey_stream.py [n_events] [n_batches] [cores]
Prints per-batch wall time (flat per-batch time = bounded state; the old
raw-buffer design grew linearly per batch) and overall ev/s.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustiflow_spark.config import EngineConfig
from rustiflow_spark.session import get_spark
from rustiflow_spark.streaming.sessionize_stream import sessionize_stream


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    spark = get_spark("bench-hotkey-stream", cores=cores, shuffle_partitions=cores)
    base = f"/tmp/rustiflow_hotkey_{os.getpid()}"
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    shutil.rmtree(base, ignore_errors=True)

    # one hot key at 10k ev/s, gaps 100 us << idle timeout: the session
    # never closes until the shutdown flush. A 1% background of cold keys
    # keeps the group-map honest.
    rng = np.random.RandomState(7)
    ts = np.arange(n_events, dtype=np.int64) * 100
    hot = pd.DataFrame(
        {
            "key": "hot",
            "ts_us": ts,
            "n_tok": rng.randint(1, 50, size=n_events).astype(np.int64),
            "direction": (rng.rand(n_events) < 0.5).astype(np.int64),
            "terminator": np.zeros(n_events, dtype=np.int64),
        }
    )
    n_cold = n_events // 100
    cold = pd.DataFrame(
        {
            "key": np.char.add("cold", rng.randint(0, 997, n_cold).astype(str)),
            "ts_us": np.sort(rng.randint(0, int(ts[-1]), n_cold)).astype(np.int64),
            "n_tok": rng.randint(1, 50, size=n_cold).astype(np.int64),
            "direction": np.zeros(n_cold, dtype=np.int64),
            "terminator": np.zeros(n_cold, dtype=np.int64),
        }
    )
    pdf = (
        pd.concat([hot, cold], ignore_index=True)
        .sort_values("ts_us", kind="mergesort")
        .reset_index(drop=True)
    )
    df = spark.createDataFrame(pdf)
    edges = np.linspace(0, int(ts[-1]) + 1, n_batches + 1).astype(np.int64)
    seen: set[str] = set()
    import glob as globmod

    for i, (a, b) in enumerate(zip(edges[:-1], edges[1:])):
        df.where(f"ts_us >= {a} AND ts_us < {b}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        cur = set(globmod.glob(f"{src}/part-*.parquet"))
        for f in cur - seen:
            os.utime(f, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))
        seen = cur

    # hot key never idles out (100 us gaps << 5 s) but the 30 s active
    # timeout cuts+emits a session ~every 30 s of event time — state stays
    # one open session + the watermark horizon regardless of stream length
    cfg = EngineConfig(idle_timeout=5, active_timeout=30, scan_mode="none")
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sess = sessionize_stream(
        stream, ["key"], cfg, watermark_delay="1 seconds"
    )
    t0 = time.time()
    batch_walls: list[float] = []
    last = t0
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    prev_batch = -1
    while q.isActive:
        time.sleep(0.2)
        lp = q.lastProgress
        if lp and lp["batchId"] != prev_batch:
            now = time.time()
            batch_walls.append(now - last)
            last = now
            prev_batch = lp["batchId"]
    q.awaitTermination(10)
    wall = time.time() - t0
    rows = spark.read.parquet(out).count()
    print(f"hot-key stream: {n_events + n_cold} events, {n_batches} micro-batches")
    print(f"per-batch wall (s): {[round(x, 2) for x in batch_walls]}")
    print(f"total {wall:.1f} s -> {(n_events + n_cold) / wall / 1e6:.2f}M ev/s; "
          f"{rows} emitted sessions")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
