"""Single-chip capacity tier: n >= 29 via in-place planar execution.

The reference's in-RAM ceiling is n=28 (412 s complex128) and its
out-of-core ceiling n=30 (631 s, 2x disk)
(``wenbo_engine/docs/v3_comparison.md:45-62``).  On a 16 GiB chip the
n=30 complex64 state is 8 GiB of f32 planes, so a second copy cannot
exist: this bench runs the window schedule with ``inplace=True``
(``input_output_aliases`` on every Pallas kernel) and planar i/o, and
records the compiler's own memory analysis to prove the fit.

Run: ``python -m quantum_simulations_tpu.bench.capacity [n ...]``.
"""
from __future__ import annotations

import json
import time

from . import setup_platform, warm_grant


def _compile_with_retries(build, retries=3):
    last = None
    for i in range(retries):
        try:
            return build()
        except Exception as e:  # transient remote-compile 500s
            last = e
            time.sleep(6 * (i + 1))
    raise last


def run(ns=(30,), reps: int = 3, retries: int = 3, only=None) -> dict:
    """``only``: optional subset of config tags (e.g. {"qft30"}) — a
    failing config can then be re-measured without re-running the rest."""
    import jax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..ops import dense
    from ..runtime import simulator

    dev = setup_platform()
    warm_grant()

    rows = []
    for n in ns:
        configs = [
            (f"ghz{n}", lib.ghz(n), True),
            (f"nonstab{n}", lib.non_stabilizer(n, depth=4, seed=7), False),
            # QFT exercises the remaining capacity op classes: merged
            # DiagOp broadcasts and multiswap transposes (out-of-place
            # per plane: peak 3 planes = 12 GiB at n=30, still fits).
            (f"qft{n}", lib.qft(n), False),
        ]
        if only:
            configs = [c for c in configs if c[0] in only]
        for tag, cd, check_amps in configs:
            row = {"config": tag, "n": n, "gates": len(cd["gates"])}
            P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
            try:
                t0 = time.time()
                fn = simulator.build_window_circuit_fn(
                    cd, dtype=jnp.complex64, planar_io=True, inplace=True,
                    donate=True,
                )
                compiled = _compile_with_retries(
                    lambda: fn.lower(P, P).compile(), retries)
                row["compile_s"] = round(time.time() - t0, 1)
                try:
                    ma = compiled.memory_analysis()
                    row["hbm_gib"] = round(
                        (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                         + ma.output_size_in_bytes) / (1 << 30), 2)
                    row["temp_gib"] = round(
                        ma.temp_size_in_bytes / (1 << 30), 2)
                except Exception:
                    pass

                norm2 = jax.jit(
                    lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
                ).lower(P, P).compile()
                amp0 = jax.jit(lambda re: re[0]).lower(P).compile()
                ampN = jax.jit(lambda re: re[(1 << n) - 1]).lower(P).compile()

                init = jax.jit(
                    lambda: dense.zero_state_planar(n)).lower().compile()
                re, im = init()

                re, im = compiled(re, im)  # warm + first application
                if check_amps:
                    inv = 1.0 / (2.0 ** 0.5)
                    row["amp0_err"] = round(
                        abs(float(jax.device_get(amp0(re))) - inv), 9)
                    row["ampN_err"] = round(
                        abs(float(jax.device_get(ampN(re))) - inv), 9)
                float(jax.device_get(norm2(re, im)))

                t0 = time.time()
                for _ in range(reps):
                    # donated/aliased planes chain naturally; one
                    # scalar fetch at the end so the ~44 ms tunnel RTT
                    # is paid once, not per rep.
                    re, im = compiled(re, im)
                norm = float(jax.device_get(norm2(re, im)))
                dt = (time.time() - t0) / reps
                row.update({
                    "steady_s": round(dt, 4),
                    "amp_updates_per_s": round(
                        len(cd["gates"]) * (1 << n) / dt, 1),
                    "norm2": round(norm, 6),
                })
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            finally:
                # The planes are half the chip's HBM — they must not
                # survive into the next config's allocation.
                import gc

                re = im = None  # noqa: F841
                gc.collect()
            rows.append(row)
            print(json.dumps(row), flush=True)
    return {"device": str(dev), "rows": rows}


def sample_run(n: int = 30, shots: int = 1_000_000, reps: int = 3,
               depth: int = 8) -> dict:
    """Measured ON-DEVICE sampling from a capacity-tier state.

    Runs a sycamore-like n-qubit circuit at the capacity tier (planar
    in-place execution), then draws ``shots`` bitstrings with the
    hierarchical inverse-CDF planar sampler
    (:func:`..ops.sampling.sample_bits_planar`): no 2^n probability
    vector, no (shots, B) noise tensor — the peak sampler footprint is
    one (512, 2^15) gathered chunk per plane.  The per-qubit one-counts
    reduce on-device (the (shots, n) bit matrix never crosses the
    tunnel), giving both the completion barrier and a frequency sanity
    check.  This is the measured analogue of the reference's
    sample-from-state path (``state_vector.hpp:829-1003``) at a size
    its in-RAM tier cannot reach.
    """
    import jax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..ops import dense, sampling
    from ..runtime import simulator

    dev = setup_platform()
    warm_grant()

    cd = lib.sycamore_like(n, depth=depth, seed=11)
    P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
    K = jax.ShapeDtypeStruct((), jnp.int32)
    row = {"config": f"sycamore{n}", "n": n, "gates": len(cd["gates"]),
           "shots": shots, "device": str(dev)}

    t0 = time.time()
    fn = simulator.build_window_circuit_fn(
        cd, dtype=jnp.complex64, planar_io=True, inplace=True, donate=True)
    circ = _compile_with_retries(lambda: fn.lower(P, P).compile())
    row["circuit_compile_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    # The key is derived in-program from a scalar seed arg: eager
    # PRNGKey creation is a host->device transfer the axon tunnel
    # can't do (NOTES_ROUND1 ground rule 4).
    samp = _compile_with_retries(lambda: jax.jit(
        lambda re, im, seed: jnp.sum(
            sampling.sample_bits_planar(
                re, im, jax.random.PRNGKey(seed), shots, n)
            .astype(jnp.int32), axis=0)
    ).lower(P, P, K).compile())
    row["sampler_compile_s"] = round(time.time() - t0, 1)
    try:
        ma = samp.memory_analysis()
        row["sampler_temp_mib"] = round(ma.temp_size_in_bytes / (1 << 20), 1)
    except Exception:
        pass

    init = jax.jit(lambda: dense.zero_state_planar(n)).lower().compile()
    re, im = init()
    t0 = time.time()
    re, im = circ(re, im)
    norm2 = jax.jit(
        lambda a, b: jnp.sum(a * a) + jnp.sum(b * b)).lower(P, P).compile()
    row["norm2"] = round(float(jax.device_get(norm2(re, im))), 6)
    row["circuit_s_incl_warm"] = round(time.time() - t0, 2)

    import numpy as np

    counts = samp(re, im, np.int32(0))  # warm
    jax.device_get(counts)
    t0 = time.time()
    for r in range(reps):
        counts = samp(re, im, np.int32(r + 1))
    counts = jax.device_get(counts)     # scalar-ish (n,) fetch
    dt = (time.time() - t0) / reps
    frac = counts / shots
    row.update({
        "sample_s": round(dt, 4),
        "shots_per_s": round(shots / dt, 1),
        "ones_frac_min": round(float(frac.min()), 4),
        "ones_frac_max": round(float(frac.max()), 4),
    })
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "sample":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
        shots = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
        print(json.dumps(sample_run(n=n, shots=shots), indent=1))
        sys.exit(0)

    # Args: ints select n values; tags like "qft30" select single
    # configs (implying their n).
    ns, only = [], set()
    for a in sys.argv[1:]:
        if a.isdigit():
            ns.append(int(a))
        else:
            only.add(a)
            ns.append(int("".join(ch for ch in a if ch.isdigit())))
    ns = tuple(dict.fromkeys(ns)) or (30,)
    print(json.dumps(run(ns=ns, only=only or None), indent=1))
