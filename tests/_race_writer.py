"""Subprocess body for test_crud.test_multiprocess_writer_race — a real
OS process with its own Spark JVM racing mutations against a sibling
process on one SnapshotStore root. Not a pytest module (underscore
prefix: not collected).

Usage: python _race_writer.py <root> <writer_id> <n_commits> <go_file>
Prints one JSON line {"writer": id, "committed": n, "retries": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root, writer_id, n_commits, go_file = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from deployment_spark import get_spark
    from deployment_spark.operators.crud import ConcurrentCommitError, SnapshotStore

    spark = get_spark(
        app_name=f"race-writer-{writer_id}", cpus=2, shuffle_partitions=2
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = SnapshotStore(spark, root, key="id", mode="mor")
    # two-phase barrier: signal THIS writer's JVM is up (ready file),
    # then wait for the parent's go — the parent releases go only after
    # BOTH ready files exist, so the contention window is the commit
    # loop, not session bring-up (a go released at spawn time would let
    # the faster JVM finish before the slower one starts — zero
    # contention, certifying nothing; r8 review)
    open(f"{go_file}.ready{writer_id}", "w").close()
    while not os.path.exists(go_file):
        time.sleep(0.05)
    committed = retries = 0
    for i in range(n_commits):
        rows = spark.createDataFrame(
            [(writer_id * 1000 + i, f"w{writer_id}")], ["id", "payload"]
        )
        while True:
            try:
                store.insert(rows)
                committed += 1
                break
            except ConcurrentCommitError:
                retries += 1
                time.sleep(0.02 * (1 + retries % 5))
    print(json.dumps({"writer": writer_id, "committed": committed, "retries": retries}))
    spark.stop()


if __name__ == "__main__":
    main()
