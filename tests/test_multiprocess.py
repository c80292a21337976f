"""Multi-PROCESS SPMD execution — the `accelerate launch` replacement
actually running (SURVEY §2.2 "multi-process launch").

Two OS processes, each with 4 virtual CPU devices and gloo collectives,
form one 8-device `jax.distributed` job via parallel.multihost.initialize;
the REAL stage-2 pipeline loss+grad runs data-parallel over the global
mesh and must match a single-device computation of the same global batch.
This is the single-host stand-in for a TPU pod slice's one-process-per-host
model (same code path: only the coordinator address differs).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_device():
    port = _free_port()
    here = os.path.dirname(os.path.abspath(__file__))
    env = {**os.environ,
           'PYTHONPATH': os.pathsep.join(
               [os.path.dirname(here)]
               + os.environ.get('PYTHONPATH', '').split(os.pathsep))}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(here, '_mp_worker.py'),
         str(pid), '2', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f'worker failed:\n{stderr[-3000:]}'
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    by_pid = {o['pid']: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o['process_count'] == 2
        assert o['global_devices'] == 8
        assert o['local_devices'] == 4
        assert o['is_main'] == (o['pid'] == 0)
        # distributed dp loss/grad == single-device on the same global batch
        np.testing.assert_allclose(o['dist_loss'], o['local_loss'],
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(o['dist_gnorm'], o['local_gnorm'],
                                   rtol=2e-4, atol=2e-4)
    # both processes observed the identical replicated result
    np.testing.assert_allclose(by_pid[0]['dist_loss'],
                               by_pid[1]['dist_loss'], rtol=1e-6)
