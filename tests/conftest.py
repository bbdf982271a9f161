import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from rustiflow_spark.session import get_spark

    s = get_spark("rustiflow-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def write_pinned_batches(src: str, frames_writers) -> None:
    """Write each item as one parquet file under src with strictly
    increasing pinned mtimes, so a FileStreamSource with
    maxFilesPerTrigger=1 replays them as micro-batches in this order.
    Each item is a zero-arg callable that performs the write (the caller
    binds the DataFrame and its filters)."""
    import glob
    import os

    seen: set[str] = set()
    for i, write in enumerate(frames_writers):
        write()
        cur = set(glob.glob(f"{src}/part-*.parquet"))
        for f in cur - seen:
            os.utime(f, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))
        seen = cur
