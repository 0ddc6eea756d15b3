"""SURVEY.md §5 item 4: jax.distributed multi-process test on localhost.

Two OS processes, one CPU device each, one global mesh: the sharded global
k-mer count must equal the single-process result exactly.  This exercises
the same `jax.distributed.initialize` + global-array path a real multi-host
pod run uses (the reference has no distributed mode at all).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_count(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": ""}  # one device per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(r), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=220)
        outs.append(out.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    with open(tmp_path / "result.json") as fh:
        res = json.load(fh)
    assert res["sharded"] == res["single"]
    # data-parallel overlap engines (Myers gate + scored SW) must match the
    # single-device kernels shard-for-shard on every process
    for r in range(2):
        with open(tmp_path / f"rank{r}.json") as fh:
            rr = json.load(fh)
        assert rr["edit_ok"] and rr["sw_ok"], (r, rr)
