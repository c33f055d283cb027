"""Two-process jax.distributed run == single-process sharded run.

Spawns dist2_worker.py twice (4 virtual CPU devices each, gloo
collectives over a local coordinator) and asserts both processes
produce the identical peak list — equal to the same pipeline run
single-process on the pytest process's own 8-device mesh.  This is
the multi-host validation path SURVEY.md §5 calls for (the reference
is single-process; multi-host is new capability)."""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np

import conftest  # noqa: F401  (pins the pytest process to 8 CPU devs)

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid: int, port: int, out_path: str):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PYTHONPATH")}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PROCESS_ID": str(pid),
        "PYTHONPATH": REPO + os.pathsep + HERE,
    })
    return subprocess.Popen(
        [sys.executable, os.path.join(HERE, "dist2_worker.py"),
         out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def test_two_process_matches_single(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.json") for i in (0, 1)]
    procs = [_spawn(i, port, outs[i]) for i in (0, 1)]
    logs = [p.communicate(timeout=600) for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, \
            f"worker {i} failed:\n{logs[i][0]}\n{logs[i][1]}"

    with open(outs[0]) as fh:
        r0 = json.load(fh)
    with open(outs[1]) as fh:
        r1 = json.load(fh)
    assert r0 == r1, "processes disagree on the final peak list"

    # expected: identical fixture through the same code path on this
    # process's own 8-device mesh (process_count() == 1)
    import dist2_worker as w

    expected = w.run()
    assert r0["lam"] == expected["lam"]
    assert r0["factor"] == expected["factor"]
    assert len(r0["peaks"]) == len(expected["peaks"]) > 0
    for got, want in zip(r0["peaks"], expected["peaks"]):
        assert got == want
    # the fixture must actually exercise the cross-process boundary
    assert any(s < 4 * w.TILE_LEN < e for (s, e, *_r) in
               expected["peaks"]), \
        "fixture lost its process-boundary-straddling peak"


def test_local_tile_range_single():
    from genrich_tpu.parallel.distributed import local_tile_range

    assert list(local_tile_range(8)) == list(range(8))


def test_host_local_events_overflow_errors():
    from genrich_tpu.parallel.distributed import host_local_events

    start = np.arange(0, 40, 2, np.int64)
    end = start + 1
    count = np.ones(len(start), np.int32)
    try:
        host_local_events(start, end, count, 4, 16, pad_to=2)
    except ValueError as e:
        assert "overflow" in str(e)
    else:
        raise AssertionError("pad_to overflow must raise")
