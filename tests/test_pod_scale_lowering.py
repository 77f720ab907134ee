"""AOT lowering of the BASELINE 34-qubit sampling config at pod scale.

The BASELINE target ("34-qubit random-circuit sampling ... on v5p-16",
/root/repo/BASELINE.md) needs 16 real chips to *time*; what CAN be
validated in this image is that the full program — window-scheduled
Sycamore-style circuit + the SPMD hierarchical sampler over a
16-device mesh — traces, SPMD-partitions and lowers with the correct
2^30-amplitude per-device shard and no 2^34 gather anywhere.  This is
the AOT analogue of the reference's no-cluster Spark testing stance
(wenbo_engine/tests/test_spark_runner_small.py:27-44).

Runs in a subprocess: the session conftest pins 8 virtual devices,
and lowering is shape-level only (no 128 GiB state is ever allocated).
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.fusion import compile_steps
from quantum_simulations_tpu.parallel import executor as E
from quantum_simulations_tpu.parallel.mesh import (
    make_mesh, shard_width, state_sharding,
)
from quantum_simulations_tpu.ops.sampling import sample_bits_sharded

N = 34
mesh = make_mesh(16)
k = shard_width(mesh, N)
assert k == 30, k                       # 2^30 amplitudes per device

cd = lib.sycamore_like(N, depth=2, seed=5)
steps = compile_steps(cd, k=k)
fn = E.build_steps_fn(mesh, N, steps, mode="window", interpret=True)

sharding = state_sharding(mesh)
psi = jax.ShapeDtypeStruct((1 << N,), jnp.complex64, sharding=sharding)
lowered = fn.lower(psi)
txt = lowered.as_text()
assert "num_partitions = 16" in txt or "num_partitions=16" in txt, (
    txt[:400])

samp = jax.jit(
    lambda s, key: sample_bits_sharded(s, key, 1024, N, mesh),
)
low2 = samp.lower(psi, jax.ShapeDtypeStruct((2,), jnp.uint32))
shots_shape = low2.out_info.shape
assert shots_shape == (1024, N), shots_shape

# Sharded CAPACITY form: planar i/o + input_output_aliases on every
# kernel pass, donated planes — the single-copy configuration a real
# 34q run needs (2^30-amp shard = 8 GiB of planes next to a 16 GiB
# budget leaves no room for a second copy).  At capacity the circuit
# must be STAGED (generic cross-shard exchanges would need a complex
# copy and are refused); stage transitions lower to per-plane
# all_to_all reshards.  The lowered module must carry the plane
# donation as an input/output alias.
from quantum_simulations_tpu.circuit import staging as S
staged, _, _ = S.stage_circuit(cd, k, "heuristic")
steps_cap = compile_steps(staged, k=k, panel_width=None)
fn_cap = E.build_steps_fn(mesh, N, steps_cap, mode="window",
                          interpret=True, inplace=True, planar_io=True)
plane = jax.ShapeDtypeStruct((1 << N,), jnp.float32, sharding=sharding)
low3 = fn_cap.lower(plane, plane)
txt3 = low3.as_text()
assert "num_partitions = 16" in txt3 or "num_partitions=16" in txt3
assert ("input_output_alias" in txt3 or "tf.aliasing_output" in txt3
        or "jax.buffer_donor" in txt3), txt3[:600]
print("POD_LOWERING_OK", len(txt))
"""


def test_34q_sampling_lowers_on_v5p16_mesh():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=500,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO),
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=16"},
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-1500:]
    assert "POD_LOWERING_OK" in r.stdout
