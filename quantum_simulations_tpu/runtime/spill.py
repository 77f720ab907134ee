"""Out-of-core runner: states beyond HBM, streamed through the device.

The TPU analogue of the reference's out-of-core engine
(``wenbo_engine/runner/single_node.py`` + ``runner/pipeline.py``): the
amplitude vector lives in host DRAM (or on disk in chunk files) and
streams through the chip in stripes of 2^m amplitudes.

Key idea for cross-stripe ("non-local") gates — **stack-and-relabel**:
a step whose non-local gates touch stripe-index bits B loads the whole
2^|B| stripe group as ONE device array of 2^(m+|B|) amplitudes in
which bit m+t carries group bit B[t]; every gate then becomes a plain
*local* gate with remapped qubit indices, applied by the standard
layout-aware engine.  The reference needs four dedicated butterfly
kernel cases (``wenbo_engine/kernel/cpu_nonlocal.py``); here the local
engine subsumes them all.

Durability: same step-WAL + a/b double-buffer as the in-HBM runner;
``QST_CRASH_AFTER_STRIPE`` hard-kills after N stripe writes for crash
tests (the reference's WE_CRASH_AFTER_CHUNK analogue).
"""
from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.contract import validate_circuit_dict
from ..circuit.fusion import GateOp, Step, compile_steps
from .chunk_store import DiskBuffer, HostBuffer
from .simulator import apply_local_ops
from .wal import WAL

CRASH_ENV = "QST_CRASH_AFTER_STRIPE"


def _f32_to_c64(x32):
    """Interleaved (re,im) float32 vector -> complex64 vector (on device)."""
    x = x32.reshape(-1, 2)
    return jax.lax.complex(x[:, 0], x[:, 1])


def _c64_to_f32(z):
    """Complex64 vector -> interleaved (re,im) float32 vector (on device)."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).reshape(-1)


def _group_bits(step: Step, m: int) -> list[int]:
    bits: set[int] = set()
    for op in step.nonlocal_ops:
        for q in op.qubits:
            if q >= m:
                bits.add(q - m)
    return sorted(bits)


def _remap_ops(step: Step, m: int, bits: list[int]) -> list:
    """All of a step's ops as local ops on the stacked 2^(m+r) array."""
    pos = {b: m + t for t, b in enumerate(bits)}
    out = list(step.local_ops)
    for op in step.nonlocal_ops:
        qs = tuple(q if q < m else pos[q - m] for q in op.qubits)
        out.append(GateOp(qubits=qs, U=op.U, name=op.name))
    return out


def _remap_ops_mesh(step: Step, m: int, bits: list[int], d: int) -> list:
    """Step ops in the SHARDED stacked frame (distributed out-of-core).

    The stacked group is uploaded as a (2^r, 2^m) array sharded
    ``P(None, AXIS)``: each device holds every group member's
    contiguous 2^(m-d) sub-block, so per-shard bit layout is

        [0, m-d)            stripe-local bits   (global qubits 0..m-d)
        [m-d, m-d+r)        host group bits     (global qubits m+bits[t])
        >= k_eff = m-d+r    device bits         (global qubits m-d..m)

    Host-group gates become plain local gates; device-bit gates keep
    qubits >= k_eff so ``exchange.apply_nonlocal`` sees device bit
    ``q - k_eff`` — the same XOR-offset machinery as the HBM-resident
    sharded tier.  This composes the reference's two scaling axes
    (distribution over disk chunks, ``wenbo_engine/runner/
    spark_runner.py:128-136``, and out-of-core tiering,
    ``docs/architecture.md:410-427``) in one frame.
    """
    lo = m - d
    k_eff = lo + len(bits)
    pos = {b: lo + t for t, b in enumerate(bits)}

    def remap(q: int) -> int:
        if q < lo:
            return q
        if q >= m:
            return pos[q - m]
        return k_eff + (q - lo)  # device bit

    out = []
    for op in list(step.local_ops) + list(step.nonlocal_ops):
        if isinstance(op, GateOp):
            out.append(GateOp(qubits=tuple(remap(q) for q in op.qubits),
                              U=op.U, name=op.name))
        else:  # LowPanelOp: qubits all < panel lane width <= m-d
            out.append(op)
    return out


class _FnCache:
    """jit cache keyed by step index (ops differ per step)."""

    def __init__(self):
        self._cache: dict = {}

    def get(self, key, ops, *, f32_io: bool = False):
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        if f32_io:
            # The argument is a host np.float32 array (the jit-arg upload
            # path is the one the tunnel supports) — host args can't be
            # donated, so no donate_argnums here.
            fn = jax.jit(
                lambda x32: _c64_to_f32(apply_local_ops(_f32_to_c64(x32), ops))
            )
        else:
            fn = jax.jit(
                lambda psi: apply_local_ops(psi, ops), donate_argnums=(0,)
            )
        self._cache[key] = fn
        return fn

    def get_mesh(self, key, mesh, ops, k_eff):
        """Sharded group program: local/group gates per shard, device-bit
        gates via XOR-offset ppermute (see :func:`_remap_ops_mesh`)."""
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..ops import exchange
        from ..parallel.mesh import AXIS

        def body(x):
            shard = x.reshape(-1)
            for op in ops:
                if isinstance(op, GateOp) and max(op.qubits) >= k_eff:
                    shard = exchange.apply_nonlocal(
                        shard, AXIS, k_eff, op.qubits, op.U)
                else:
                    shard = apply_local_ops(shard, [op])
            return shard.reshape(x.shape)

        run = shard_map(body, mesh=mesh, in_specs=P(None, AXIS),
                        out_specs=P(None, AXIS))
        fn = jax.jit(run, donate_argnums=(0,))
        self._cache[key] = fn
        return fn


def run_out_of_core(
    circuit_dict: dict,
    *,
    stripe_qubits: int,
    backend: str = "host",
    work_dir=None,
    dtype="complex64",
    use_wal: bool = True,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    use_staging: bool = False,
    staging_method: str = "auto",
    pipeline: bool = True,
    transfer: str = "native",
    mesh=None,
    initial_state=None,
    single_copy: bool = False,
) -> np.ndarray | Path:
    """Simulate with the state held outside HBM.

    ``mesh``: a :class:`jax.sharding.Mesh` distributes every stripe
    (and stripe-group stack) across the devices — the composition of
    the out-of-core and sharded tiers for states beyond the
    *aggregate* HBM of a pod.  Stripe bits [0, m-d) stay shard-local,
    bits [m-d, m) ride the XOR-offset ICI exchange, bits >= m are
    host stripe-index bits handled by stack-and-relabel, exactly
    mirroring the reference's Spark-executors-over-disk-chunks
    composition (``wenbo_engine/runner/spark_runner.py:128-136``).

    backend='host': amplitudes in host DRAM (returns the final numpy
    state; ``use_wal`` is ignored — host buffers don't survive the
    process anyway).  backend='disk': chunk files under ``work_dir``
    with WAL + double buffer (returns the work dir; read with
    :func:`collect_state`).

    ``use_staging`` remaps qubits so hot qubits stay stripe-local,
    trading SWAP passes for fewer stripe-GROUP steps — the reference's
    primary use of Atlas staging (out-of-core I/O reduction,
    ``wenbo_engine/runner/single_node.py:109-121``).  Host-backend
    results are un-permuted before returning; disk runs record
    ``qubit_mapping.json`` applied by :func:`collect_state`.

    ``transfer='f32'`` moves stripes across the host<->device boundary
    as interleaved (re,im) float32 vectors instead of complex64, and
    drains group passes one stripe-sized device slice at a time.  This
    is for backends whose DMA path lacks complex transfers or large
    single fetches (the axon dev tunnel: complex64 upload and >=64 MB
    fetch are UNIMPLEMENTED — ``bench/probe_transfer.py``); the device
    programs convert at the edges, so compute runs complex64 either
    way.  complex64 only.
    """
    cd = validate_circuit_dict(circuit_dict)
    n = cd["number_of_qubits"]
    m = min(stripe_qubits, n)

    d = 0
    if mesh is not None:
        d = int(np.log2(mesh.size))
        if (1 << d) != mesh.size:
            raise ValueError("mesh size must be a power of two")
        if m - d < 1:
            raise ValueError(
                f"stripe_qubits={m} leaves no shard-local bits on a "
                f"{mesh.size}-device mesh")
        if transfer == "f32":
            raise ValueError("transfer='f32' is single-device only")
        if panel_width is not None:
            # low panels must stay within the shard-local bits
            panel_width = max(1, min(panel_width, m - d))

    log2phys = None
    if use_staging and m < n:
        from ..circuit import staging as S

        method = staging_method
        if method == "auto":
            stats = S.staging_stats(cd, m, "heuristic")
            method = ("heuristic"
                      if stats["exchanges_staged"] < stats["exchanges_unstaged"]
                      else None)
        if method:
            cd, log2phys, _ = S.stage_circuit(cd, m, method)
            if log2phys == list(range(n)):
                log2phys = None

    f32_io = transfer == "f32"
    if f32_io and np.dtype(dtype) != np.complex64:
        raise ValueError("transfer='f32' supports dtype=complex64 only")
    if (initial_state is not None or single_copy) and backend != "host":
        raise ValueError("initial_state/single_copy are host-backend only")

    def _up(arr: np.ndarray):
        """Host stripe -> array handed to the device program.

        f32 mode hands the interleaved float32 view straight to the
        jitted program (jit-arg upload); native mode device_puts the
        complex stripe eagerly so the step program can donate it.
        """
        a = np.ascontiguousarray(arr)
        if f32_io:
            return a.view(np.float32)
        return jnp.asarray(a, dtype=dtype)

    def _down(arr: np.ndarray) -> np.ndarray:
        """Fetched device output -> host complex stripe."""
        return arr.view(np.complex64) if f32_io else arr

    def _up_mesh(arr: np.ndarray, r: int):
        """Stacked group -> (2^r, 2^m) array sharded over the mesh
        (device bits = the stripe's top d bits; see _remap_ops_mesh)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import AXIS

        a = np.ascontiguousarray(arr).reshape(1 << r, 1 << m)
        return jax.device_put(
            jnp.asarray(a, dtype=dtype), NamedSharding(mesh, P(None, AXIS)))

    steps = compile_steps(cd, k=m, use_fusion=use_fusion, panel_width=panel_width)
    cache = _FnCache()
    crash_after = int(os.environ.get(CRASH_ENV, "-1"))
    writes = 0

    if backend == "host":
        src = HostBuffer(n, m, dtype=np.dtype(dtype))
        if initial_state is not None:
            if log2phys is not None:
                raise ValueError("initial_state with use_staging is "
                                 "unsupported (state is in logical order)")
            if callable(initial_state):
                # Stripe generator: fills the buffer without a second
                # full-state array co-live (n=33 = 64 GiB at c64).
                for s in range(src.n_stripes):
                    src.write(s, np.asarray(initial_state(s),
                                            dtype=np.dtype(dtype)))
            else:
                arr = np.asarray(initial_state)
                if arr.size != 1 << n:
                    raise ValueError("initial_state size mismatch")
                if arr.ndim != 1:
                    raise ValueError("initial_state must be 1-D "
                                     "(stripe addressing slices axis 0)")
                # ADOPTED, not copied (a second 2^n copy defeats the
                # tier's memory point): the caller's array becomes the
                # working buffer and is OVERWRITTEN with simulation
                # state.  Pass arr.copy() to keep the original.
                src.data = (arr if arr.dtype == np.dtype(dtype)
                            else arr.astype(np.dtype(dtype)))
        # single_copy: write results back into the SAME buffer — valid
        # because within one step every stripe (or stripe group) is
        # read exactly once, fully computed, then written; the depth-2
        # pipeline only ever holds writes for stripes already consumed.
        # Halves host RAM (the reference's out-of-core tier always
        # double-buffers, wenbo_engine/runner/single_node.py) — what
        # makes n=33 c64 (64 GiB) runnable on this 125 GB host.
        dst = src if single_copy else HostBuffer(
            n, m, dtype=np.dtype(dtype), init_zero_state=False)
        wal = None
        start = 0
    elif backend == "disk":
        if work_dir is None:
            raise ValueError("disk backend requires work_dir")
        work_dir = Path(work_dir)
        work_dir.mkdir(parents=True, exist_ok=True)
        plan = f"ooc,m={m},fusion={use_fusion},steps={len(steps)}"
        wal = WAL(work_dir / "wal.json", cd, plan=plan) if use_wal else None
        bufs = {}
        for name in ("a", "b"):
            path = work_dir / f"buf_{name}"
            if (path / "manifest.json").exists():
                bufs[name] = DiskBuffer.open(path)
            else:
                bufs[name] = DiskBuffer(path, n, m)
        start = wal.done_steps if wal else 0
        committed = (wal.committed_buf if wal else None) or "a"
        src, dst = bufs[committed], bufs["a" if committed == "b" else "b"]
    else:
        raise ValueError(f"unknown backend {backend!r}")

    def _write_stripe(buf, s, arr):
        nonlocal writes
        buf.write(s, np.asarray(arr))
        writes += 1
        if 0 <= crash_after < writes:
            os._exit(1)

    for step_idx in range(start, len(steps)):
        step = steps[step_idx]
        bits = _group_bits(step, m)
        r = len(bits)
        key = (step_idx,)
        if mesh is not None:
            fn = cache.get_mesh(key, mesh, _remap_ops_mesh(step, m, bits, d),
                                m - d + r)
        else:
            fn = cache.get(key, _remap_ops(step, m, bits), f32_io=f32_io)

        if r == 0 and mesh is None:
            # Depth-2 software pipeline: the next stripe's H2D upload and
            # device compute are dispatched before the previous result is
            # drained to host, so transfer/compute/write overlap (the
            # reference does this with reader/worker/writer threads,
            # wenbo_engine/runner/pipeline.py; JAX's async dispatch gives
            # it without threads).  ``pipeline=False`` drains each stripe
            # synchronously — kept for the overlap benchmark
            # (bench/spill_bw.overlap) and debugging.
            if not pipeline:
                for s in range(src.n_stripes):
                    out = fn(_up(src.read(s)))
                    _write_stripe(dst, s, _down(np.asarray(out)))
            else:
                prev_s, prev_out = None, None
                for s in range(src.n_stripes):
                    out = fn(_up(src.read(s)))
                    if prev_out is not None:
                        _write_stripe(dst, prev_s, _down(np.asarray(prev_out)))
                    prev_s, prev_out = s, out
                if prev_out is not None:
                    _write_stripe(dst, prev_s, _down(np.asarray(prev_out)))
        else:
            # Same depth-2 pipeline as the local path: group k+1's
            # upload + device compute are dispatched (JAX async) before
            # group k's result is drained to the host, so PCIe transfer
            # and compute overlap across stripe groups too (the round-1
            # version drained synchronously per group).
            group_masks = [1 << b for b in bits]
            free_bits = [b for b in range(n - m) if b not in bits]
            L = src.stripe_len

            def _drain_group(members, out):
                if f32_io:
                    # Fetch one stripe-sized device slice at a time (a
                    # whole-group fetch can exceed the backend's single-
                    # transfer limit).
                    for j, s in enumerate(members):
                        seg = np.asarray(out[2 * j * L:2 * (j + 1) * L])
                        _write_stripe(dst, s, _down(seg))
                else:
                    p_host = np.asarray(out).reshape(-1)
                    for j, s in enumerate(members):
                        _write_stripe(dst, s, p_host[j * L:(j + 1) * L])

            prev = None
            for base_sel in range(1 << len(free_bits)):
                base = 0
                for t, b in enumerate(free_bits):
                    if (base_sel >> t) & 1:
                        base |= 1 << b
                members = []
                for pat in range(1 << r):
                    s = base
                    for t in range(r):
                        if (pat >> t) & 1:
                            s |= group_masks[t]
                    members.append(s)
                stacked = np.concatenate([src.read(s) for s in members])
                out = fn(_up_mesh(stacked, r) if mesh is not None
                         else _up(stacked))
                if not pipeline:
                    _drain_group(members, out)
                    continue
                if prev is not None:
                    _drain_group(*prev)
                prev = (members, out)
            if prev is not None:
                _drain_group(*prev)

        if wal:
            dst.write_manifest()
            name = "a" if dst is bufs["a"] else "b"
            wal.commit_step(step_idx, name)
        src, dst = dst, src

    if backend == "host":
        out = src.to_array()  # src/dst swapped after last step
        if log2phys is not None:
            from ..circuit.staging import permute_state

            out = permute_state(out, log2phys)
        return out
    if log2phys is not None:
        from .wal import atomic_write_json

        atomic_write_json(work_dir / "qubit_mapping.json",
                          {"log2phys": log2phys})
    return work_dir


def collect_state(work_dir, *, apply_permutation: bool = True) -> np.ndarray:
    """Final state of a finished disk-backed run (un-permutes staging)."""
    import json

    work_dir = Path(work_dir)
    rec = json.loads((work_dir / "wal.json").read_text())
    buf = rec["committed_buf"] or "a"
    psi = DiskBuffer.open(work_dir / f"buf_{buf}").to_array()
    mapping_path = work_dir / "qubit_mapping.json"
    if apply_permutation and mapping_path.exists():
        l2p = json.loads(mapping_path.read_text()).get("log2phys")
        if l2p:
            from ..circuit.staging import permute_state

            psi = permute_state(psi, l2p)
    return psi
