"""Multi-host runtime entry (parallel/multihost.py).

The reference's comm backend is single-process DataParallel
(reference train.py:126) with manual test-list chunking
(reference test.py:108-113).  Our equivalent is jax.distributed +
per-process strided list sharding; the cross-process path is proven with a
real 2-process CPU run (subprocesses joining one coordinator, global device
enumeration + a cross-process psum).
"""

import os
import socket
import subprocess
import sys

import pytest

from list_tpu.parallel.multihost import shard_datalist

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('XLA_FLAGS', None)
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, {repo!r})
from list_tpu.parallel import multihost

pid = multihost.initialize()   # from COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
assert pid == int(os.environ['PROCESS_ID']), (pid, os.environ['PROCESS_ID'])
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()          # global device list
assert len(jax.local_devices()) == 1

# cross-process collective: psum of (process_index + 1) over the global mesh
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()), ('data',))
local = jnp.full((1, 4), float(pid + 1))
garr = jax.make_array_from_single_device_arrays(
    (2, 4), NamedSharding(mesh, P('data')),
    [jax.device_put(local, jax.local_devices()[0])])
total = jax.jit(lambda x: jnp.sum(x, axis=0),
                out_shardings=NamedSharding(mesh, P()))(garr)
np.testing.assert_allclose(np.asarray(total), np.full(4, 3.0))

lst = multihost.shard_datalist(list(range(10)))
assert lst == list(range(10))[pid::2]
print(f'worker {{pid}} OK', flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_runtime(tmp_path):
    script = tmp_path / 'worker.py'
    script.write_text(_WORKER.format(repo=REPO))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   COORDINATOR_ADDRESS=f'127.0.0.1:{port}',
                   NUM_PROCESSES='2', PROCESS_ID=str(pid),
                   PYTHONPATH=REPO)
        env.pop('XLA_FLAGS', None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'
        assert f'worker {pid} OK' in out


def test_shard_datalist_strided():
    data = [f'shape_{i}' for i in range(11)]
    # explicit indices (no runtime needed)
    s0 = shard_datalist(data, process_index=0, process_count=4)
    s1 = shard_datalist(data, process_index=1, process_count=4)
    s3 = shard_datalist(data, process_index=3, process_count=4)
    assert s0 == data[0::4] and s1 == data[1::4] and s3 == data[3::4]
    # all shards partition the list
    all_items = sorted(sum((shard_datalist(data, i, 4) for i in range(4)),
                           []))
    assert all_items == sorted(data)
    # single process: identity
    assert shard_datalist(data, 0, 1) == data


def test_initialize_single_process_noop():
    from list_tpu.parallel import multihost
    # num_processes=1 with no coordinator: no-op, returns 0, and is
    # idempotent.
    assert multihost.initialize(num_processes=1) == 0
    assert multihost.initialize(num_processes=1) == 0
