"""Two-process jax.distributed smoke test for dist.initialize_distributed.

The reference is single-process shared memory (SURVEY.md §5); the
multi-host entry point must at least bring up a 2-process CPU cluster:
each worker calls initialize_distributed (the tpusfm wrapper, not raw
jax), asserts the global process/device view, and runs one
cross-process psum over a global mesh. Skips gracefully where the jax
build does not support multi-process CPU collectives.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, "__REPO__")
import jax
import jax.numpy as jnp
import numpy as np
from tpusfm.dist import initialize_distributed

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

# one cross-process collective over the global mesh
from jax.sharding import Mesh, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ("d",))
def f(x):
    return jax.lax.psum(x, "d")
y = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P(), out_specs=P()))(
    jnp.asarray([1.0]))
np.testing.assert_allclose(np.asarray(y), [4.0])
print(f"worker {pid} OK", flush=True)
"""


def test_two_process_distributed(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__REPO__", repo))
    # PALLAS_AXON_POOL_IPS triggers the axon sitecustomize, which
    # initializes the XLA backend at interpreter startup — before the
    # worker can call jax.distributed.initialize. Strip it.
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "PALLAS_AXON_POOL_IPS", "PALLAS_AXON_TPU_GEN")}
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process jax.distributed timed out on this platform")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        if ("UNIMPLEMENTED" in joined or "not supported" in joined
                or "cross-host" in joined):
            pytest.skip("jax build lacks multi-process CPU collectives")
        raise AssertionError(f"worker failed:\n{joined}")
    assert all("OK" in o for o in outs)
