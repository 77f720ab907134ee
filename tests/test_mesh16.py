"""16-device virtual-mesh coverage (VERDICT r4 #6).

The driver artifact (`MULTICHIP_r*.json`) runs `dryrun_multichip(8)`;
these tests exercise mesh size 16 — a 4th device bit and 2-bit-deeper
all_to_all reshard groups — on the virtual CPU platform, plus an
EXECUTED scaled-down (n=14) instance of the exact 34q pod staged
program that `test_pod_scale_lowering.py` AOT-lowers at 16.

Reference analogue: the multi-rank tier `hisvsim_repo/svsim-mpi.hpp:123-173`
(tested there with small MPI world sizes for the same reason).
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dryrun_multichip_16_all_tiers():
    """The full 5-tier dry run (fused exchange, window+staged reshard,
    in-place capacity, WAL crash+resume on the mesh, mesh x spill) at
    n_devices=16.  `dryrun_multichip` self-bootstraps its own
    16-device subprocess, so this runs fine under the 8-device
    conftest pin."""
    sys.path.insert(0, str(REPO))
    import __graft_entry__ as g

    g.dryrun_multichip(16)  # raises on any tier failure


EXEC_SCRIPT = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit import staging as S
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.ops.sampling import sample_bits_sharded
from quantum_simulations_tpu.parallel import executor as E
from quantum_simulations_tpu.parallel import mesh as M
from quantum_simulations_tpu.utils.transfer import fetch_array

n = 14
mesh = M.make_mesh(16)
k = M.shard_width(mesh, n)
assert k == n - 4, k                      # 4th device bit exercised
cd = lib.sycamore_like(n, depth=2, seed=5)  # the 34q config, scaled
staged, log2phys, stats = S.stage_circuit(cd, k, "heuristic")
_, fn = E.build_circuit_fns(mesh, staged, mode="window", inplace=True,
                            planar_io=True, dtype=jnp.complex64)
re, im = M.zero_state_planar_sharded(mesh, n)
re, im = fn(re, im)
got = (fetch_array(re) + 1j * fetch_array(im)).astype(np.complex64)
got = S.permute_state(got, log2phys)
want = oracle.simulate(cd).astype(np.complex64)
err = float(np.max(np.abs(got - want)))
assert err < 1e-4, err

psi = E.simulate_sharded(mesh, staged, dtype="complex64", mode="window")
shots = np.asarray(jax.jit(
    lambda s, key: sample_bits_sharded(s, key, 64, n, mesh)
)(psi, jnp.asarray([0, 1], jnp.uint32)))
assert shots.shape == (64, n), shots.shape
p2 = np.abs(oracle.simulate(staged)) ** 2
idx = (shots.astype(np.int64) << np.arange(n, dtype=np.int64)).sum(1)
assert float(p2[idx].min()) > 1e-12       # no impossible state sampled
print("MESH16_EXEC_OK", err)
"""


def test_pod34q_program_executes_scaled_at_16():
    r = subprocess.run(
        [sys.executable, "-c", EXEC_SCRIPT],
        capture_output=True, text=True, timeout=500,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO),
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=16"},
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-1500:]
    assert "MESH16_EXEC_OK" in r.stdout


def test_bench_local_has_16_device_rows():
    """Regression guard: the 16-device rows stay frozen in
    BENCH_LOCAL `sharded_virtual_mesh` (VERDICT r4 done-criterion)."""
    import json

    d = json.load(open(REPO / "BENCH_LOCAL.json"))
    rows = {r["config"]: r for r in d["sharded_virtual_mesh"]["rows"]}
    dry = rows["dryrun_5tier_sharded16"]
    assert dry["ok"] is True and len(dry["tiers"]) == 5
    pod = rows["pod34q_program_n14_sharded16_capacity"]
    assert pod["max_err_vs_oracle"] < 1e-4
    assert pod["sampler_shots"] == 64
