"""Two-process (DCN-tier) rehearsal: a REAL multi-process cluster.

The reference actually executes its distributed runner on local[2]
Spark executors (``wenbo_engine/tests/test_spark_runner_small.py:27-44``)
and ships runnable MPI (``hisvsim_repo/svsim-mpi.hpp:12-198``).  The
TPU-native equivalent is exercised here with TWO OS processes, each
owning 4 virtual CPU devices, joined through
``jax.distributed.initialize`` (rendezvous on a localhost coordinator,
collectives over Gloo — the same PJRT cross-process path a multi-host
TPU pod uses over DCN):

* ``make_pod_mesh`` builds the 8-device host-contiguous global mesh;
* a sharded circuit whose gates span the PROCESS boundary (top device
  bit) runs under ``shard_map`` — ppermute exchanges and an
  ``all_to_all`` bit-permutation reshard both cross processes;
* correctness is checked fully SPMD: per-shard overlap with the
  complex128 oracle, ``psum``-reduced (no state gather);
* ``device_bit_costs`` must mark intra-process bits ICI and the
  process-crossing bit DCN.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path


REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from quantum_simulations_tpu.parallel import distributed as D

    pid = int(sys.argv[1]); port = sys.argv[2]
    ok = D.init_distributed(coordinator_address=f"127.0.0.1:{{port}}",
                            num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from jax import lax, shard_map
    from jax.sharding import PartitionSpec as P

    from quantum_simulations_tpu.circuit import library as lib
    from quantum_simulations_tpu.oracle import dense_numpy as oracle
    from quantum_simulations_tpu.parallel import executor as E
    from quantum_simulations_tpu.parallel import mesh as M
    from quantum_simulations_tpu.parallel.reshard import swap_device_bits

    mesh = D.make_pod_mesh(8)
    assert mesh.size == 8 and D.is_multihost()

    # The scheduler's mesh cost model must see the process boundary:
    # bits 0-1 stay inside a 4-device process (ICI), bit 2 crosses (DCN).
    costs = D.device_bit_costs(mesh)
    assert costs == [D.ICI_COST, D.ICI_COST, D.DCN_COST], costs

    n = 6  # k = 3 local qubits; qubits 3,4 = ICI bits, qubit 5 = DCN bit
    gates = [{{"qubits": [q], "gate": "H"}} for q in range(n)]
    gates += [
        {{"qubits": [5], "gate": "T"}},                  # DCN-bit diag: no traffic
        {{"qubits": [0, 5], "gate": "CNOT"}},            # target on the DCN bit
        {{"qubits": [5, 0], "gate": "CNOT"}},            # control on the DCN bit
        {{"qubits": [5], "gate": "H"}},                  # 1q butterfly over DCN
        {{"qubits": [0, 5], "gate": "SWAP"}},            # boundary SWAP -> reshard
        {{"qubits": [4, 5], "gate": "SWAP"}},            # both qubits device bits
        {{"qubits": [5, 4], "gate": "CR", "params": {{"k": 2}}}},
        {{"qubits": [1], "gate": "T"}},
    ]
    cd = {{"number_of_qubits": n, "gates": gates}}

    psi = E.simulate_sharded(mesh, cd, dtype="complex128")
    want = oracle.simulate(cd)

    # SPMD check: overlap <oracle|psi> and norm as psum reductions —
    # nothing is gathered across processes.
    k = M.shard_width(mesh, n)
    w = jnp.asarray(want)

    def body(shard):
        shard = shard.reshape(-1)
        i = lax.axis_index(M.AXIS)
        mine = lax.dynamic_slice_in_dim(w, i * (1 << k), 1 << k)
        ov = lax.psum(jnp.vdot(mine, shard), M.AXIS)
        n2 = lax.psum(jnp.sum(jnp.abs(shard) ** 2), M.AXIS)
        return jnp.stack([jnp.abs(ov), n2]).astype(jnp.float64)

    out = jax.jit(shard_map(body, mesh=mesh, in_specs=P(M.AXIS),
                            out_specs=P()))(psi)
    overlap, norm2 = map(float, np.asarray(out))
    assert abs(overlap - 1.0) < 1e-10, overlap
    assert abs(norm2 - 1.0) < 1e-10, norm2

    # Cross-process bit-permutation reshard: swap a local bit with the
    # DCN bit and compare against the oracle permutation, per shard.
    perm = np.arange(1 << n)
    src = ((perm >> 0) & 1).astype(np.int64)
    dst = ((perm >> 5) & 1).astype(np.int64)
    swapped = (perm & ~((1 << 0) | (1 << 5))) | (src << 5) | (dst << 0)
    want_r = np.asarray(want)[swapped]
    wr = jnp.asarray(want_r)

    def body_r(shard):
        shard = swap_device_bits(shard.reshape(-1), M.AXIS, k, [(0, 5)])
        i = lax.axis_index(M.AXIS)
        mine = lax.dynamic_slice_in_dim(wr, i * (1 << k), 1 << k)
        return lax.psum(jnp.max(jnp.abs(shard - mine)), M.AXIS).reshape(1)

    err = float(np.asarray(jax.jit(shard_map(
        body_r, mesh=mesh, in_specs=P(M.AXIS), out_specs=P()))(psi))[0])
    assert err < 1e-12, err

    print(json.dumps({{"pid": pid, "overlap": overlap, "norm2": norm2,
                       "reshard_err": err, "costs": costs}}), flush=True)
""").format(repo=str(REPO))


def test_two_process_pod_rehearsal():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("QST_COORDINATOR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        )
        for i in range(2)
    ]
    results = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    for r in results:
        assert abs(r["overlap"] - 1.0) < 1e-10
        assert abs(r["norm2"] - 1.0) < 1e-10
        assert r["reshard_err"] < 1e-12
        assert r["costs"][-1] > r["costs"][0]  # top bit is DCN
