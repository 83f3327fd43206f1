#!/usr/bin/env python
"""Measure the DEEP-clone copy paths (VERDICT r11 "What's wrong" #1).

Deep clone ships its (src, dst) file copies as Spark tasks above
``_DEEP_CLONE_DRIVER_MAX_BYTES`` (store/txtable.py). This study
isolates the two claims behind that design on a synthetic file set:

1. **Parallelism**: within the distributed path, wall time scales
   with the task count — the copy is NOT serialized behind one
   thread. (On this single-disk local host the ceiling is page-cache
   bandwidth; on a real cluster it is N executors x object-store
   bandwidth, which a driver-side loop can never reach.)
2. **Routing**: below the threshold a driver loop wins — scheduling
   a Spark job for a metadata-sized table costs more than the copy —
   which is why small deep clones stay driver-side.

Prints ONE JSON line. Usage:
    python tools/deep_clone_study.py [n_files] [mb_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypeman_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("deep_clone_study", cpus=cpus)
    sc = spark.sparkContext
    root = tempfile.mkdtemp(prefix="deep_clone_study_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    blob = os.urandom(mb << 20)
    for i in range(n_files):
        with open(os.path.join(src, f"f{i}.bin"), "wb") as fh:
            fh.write(blob)

    def pairs_for(tag: str):
        return [
            (os.path.join(src, f"f{i}.bin"),
             os.path.join(root, tag, f"f{i}.bin"))
            for i in range(n_files)
        ]

    def copy_part(it):
        for s, d in it:
            os.makedirs(os.path.dirname(d), exist_ok=True)
            shutil.copy2(s, d)

    out: dict = {
        "metric": "deep_clone_copy_paths", "unit": "sec",
        "n_files": n_files, "total_mb": n_files * mb,
    }
    # distributed path at increasing task counts (cache warmed by the
    # file writes above, identical for every variant)
    for slices in (1, 2, 4, 8, cpus):
        tag = f"tasks_{slices}"
        t0 = time.time()
        sc.parallelize(pairs_for(tag), slices).foreachPartition(copy_part)
        out[f"executor_{slices}_tasks_s"] = round(time.time() - t0, 3)
        shutil.rmtree(os.path.join(root, tag), ignore_errors=True)
    # driver-serial baseline (what the pre-r12 thread pool degraded to
    # per unit of driver bandwidth; also the small-table fast path)
    t0 = time.time()
    copy_part(iter(pairs_for("serial")))
    out["driver_serial_s"] = round(time.time() - t0, 3)
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
