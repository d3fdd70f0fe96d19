"""Sample active-task concurrency while the image UDF stage runs.

Usage: python tools/task_probe.py [cpus] [n_rows]
Prints one line per second: active tasks per stage — diagnoses whether a
throughput ceiling is missing parallelism (few active tasks) or slow tasks.
"""

from __future__ import annotations

import sys
import threading
import time

sys.path.insert(0, ".")

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = int(sys.argv[2]) if len(sys.argv) > 2 else 960000

import bench  # noqa: E402
from ndto_spark.batch import image_batch_violations  # noqa: E402

spark = bench.get_spark(cpus)
path = bench.materialize_images(spark, n, 32)
df = spark.read.parquet(path)
image_batch_violations(df.limit(4000), 42).count()  # warm

tracker = spark.sparkContext.statusTracker()
stop = threading.Event()


def sample():
    while not stop.is_set():
        stages = tracker.getActiveStageIds()
        parts = []
        for sid in stages:
            info = tracker.getStageInfo(sid)
            if info:
                parts.append(
                    f"stage{sid}: active={info.numActiveTasks} "
                    f"done={info.numCompletedTasks}/{info.numTasks}"
                )
        print(" | ".join(parts) or "(idle)", flush=True)
        time.sleep(1)


t = threading.Thread(target=sample, daemon=True)
t.start()
t0 = time.time()
nv = image_batch_violations(df, 42).count()
stop.set()
print(f"DONE {time.time()-t0:.1f}s viols={nv} cpus={cpus}")
