"""True multi-PROCESS SPMD test for the `--multihost` path.

The CLIs' `--multihost` flag (cli/train.py::_maybe_init_multihost,
cli/demo.py) turns the single-process SPMD program into a multi-host one
via jax.distributed.initialize(). Real multi-host TPU hardware does not
exist on this box, but jax.distributed works across OS processes on CPU
(gloo collectives), so this spawns TWO real processes that rendezvous,
build the repo's (dp x tp) mesh with dp spanning the process boundary,
and verify a gradient all-reduce mixes both processes' data
(tests/mp_worker.py has the assertions). This is the same
process-boundary mechanics a 2-host TPU pod run exercises — only the
transport differs (gloo here, ICI/DCN there).

Reference being replaced: torch.distributed DDP spawn + NCCL rendezvous
(/root/reference/train.py:202-210, demo.py:196-207).
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(port: int):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mp_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=600)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_dp_allreduce():
    procs, outs = _run_pair(_free_port())
    if any(p.returncode for p in procs) and any(
        "in use" in o.lower() or "bind" in o.lower() for o in outs
    ):
        # _free_port is probe-then-close (TOCTOU): an unrelated process can
        # grab the port in the gap. One fresh-port retry, only for that case.
        procs, outs = _run_pair(_free_port())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} MP-OK" in out, out[-3000:]
