"""Contamination preflight (VERDICT r4 #2): bench measurements must
self-describe when foreign Spark processes share the box."""

import subprocess
import time

import bench


def test_foreign_spark_pids_detects_planted_master():
    p = subprocess.Popen(["bash", "-c", "exec -a deploy.master.Master sleep 10"])
    try:
        time.sleep(0.3)
        assert p.pid in bench.foreign_spark_pids()
    finally:
        p.kill()
        p.wait()


def test_foreign_spark_pids_excludes_self_and_parent():
    import os

    pids = bench.foreign_spark_pids()
    assert os.getpid() not in pids
    assert os.getppid() not in pids
