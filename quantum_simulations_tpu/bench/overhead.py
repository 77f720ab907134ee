"""Per-pass dispatch-overhead study for the window executor.

The n=28 headline program runs 16 HBM passes in 182 ms, but racing the
individual kernels sums to ~143 ms — ~2.4 ms/pass is unaccounted for
inside the jit program.  This module isolates where it goes:

* ``nonstab_variants`` — the headline circuit under the four io/alias
  policies (complex io vs planar end-to-end; donated vs not; aliased
  Pallas kernels vs not).  The complex<->planar conversion is two full
  HBM passes per call that the pass count never shows.
* ``panel_scaling`` — programs of k identical lane-panel passes for
  k in (2, 4, 8, 16); a linear fit gives the true marginal cost of one
  pass (slope) and the fixed program overhead (intercept).

Analogue of the reference's matmul-vs-I/O decomposition
(``wenbo_engine/bench/matmul_vs_io.py:91-140``) — there the question
was "how many gates amortize one I/O pass", here it is "how much of a
pass is HBM traffic vs dispatch gap".

Run: ``python -m quantum_simulations_tpu.bench.overhead``.
"""
from __future__ import annotations

import json
import time

import numpy as np

from . import setup_platform, warm_grant


def _compile_with_retries(build, retries: int = 3):
    last = None
    for i in range(retries):
        try:
            return build()
        except Exception as e:  # transient remote-compile 500s
            last = e
            time.sleep(6 * (i + 1))
    raise last


def nonstab_variants(n: int = 28, reps: int = 10, retries: int = 3) -> list:
    import jax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..ops import dense
    from ..runtime import simulator

    cd = lib.non_stabilizer(n, depth=4, seed=7)
    gates = len(cd["gates"])
    S = jax.ShapeDtypeStruct((1 << n,), jnp.complex64)
    P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)

    variants = [
        ("complex_io", dict(planar_io=False, donate=False, inplace=False)),
        ("complex_io_donate", dict(planar_io=False, donate=True,
                                   inplace=False)),
        ("planar_io", dict(planar_io=True, donate=False, inplace=False)),
        ("planar_io_donate", dict(planar_io=True, donate=True,
                                  inplace=False)),
        ("planar_io_donate_inplace", dict(planar_io=True, donate=True,
                                          inplace=True)),
    ]
    rows = []
    for tag, kw in variants:
        row = {"variant": tag, "n": n, "gates": gates}
        try:
            planar = kw["planar_io"]
            t0 = time.time()
            fn = simulator.build_window_circuit_fn(
                cd, dtype=jnp.complex64, **kw)
            compiled = _compile_with_retries(
                lambda: (fn.lower(P, P) if planar else fn.lower(S)).compile(),
                retries)
            row["compile_s"] = round(time.time() - t0, 1)

            if planar:
                norm2 = jax.jit(
                    lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
                ).lower(P, P).compile()
                init = jax.jit(
                    lambda: dense.zero_state_planar(n)).lower().compile()
                state = init()
                state = compiled(*state)  # warm
                float(jax.device_get(norm2(*state)))
                t0 = time.perf_counter()
                for _ in range(reps):
                    state = compiled(*state)
                norm = float(jax.device_get(norm2(*state)))
                dt = (time.perf_counter() - t0) / reps
            else:
                norm2 = jax.jit(
                    lambda x: jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2)
                ).lower(S).compile()
                mk = jax.jit(lambda: jnp.zeros(
                    1 << n, jnp.complex64).at[0].set(1.0))
                psi = compiled(mk())  # warm
                float(jax.device_get(norm2(psi)))
                if kw["donate"]:
                    psi = mk()  # the warm run consumed its input
                t0 = time.perf_counter()
                out = psi
                for _ in range(reps):
                    out = compiled(out)
                norm = float(jax.device_get(norm2(out)))
                dt = (time.perf_counter() - t0) / reps
            row.update({
                "steady_s": round(dt, 4),
                "ms_per_pass_16": round(dt / 16 * 1e3, 2),
                "norm2": round(norm, 6),
            })
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def wal_tax(n: int = 28, checkpoint_every: int = 4,
            max_levels_per_step: int = 1) -> list:
    """Measure the durability tax: the flagship window kernels UNDER
    the WAL runner vs bare execution.

    Three configs at n qubits (nonstab, the headline circuit):

    * ``wal_ck{c}``   — WAL + checkpoint every c steps (the production
      durability posture);
    * ``wal_final``   — WAL on, but only the final state checkpointed;
    * ``no_wal``      — runner with durability off (still one final
      state save, like the reference's bare runner writing its result).

    Each row decomposes wall time via the runner's own timers into
    compile / steps / checkpoint-fetch.  ``steps_s`` is the number to
    compare against the whole-circuit headline (0.133 s at n=28): it
    is the same kernels dispatched per-step with donation.  The
    checkpoint term is tunnel-bound on this dev setup (~28 MB/s; a
    production PCIe host moves the same 2 GiB at 10+ GB/s — both the
    measured and the projected figure are reported).

    Reference analogue: fault-tolerance overhead is implicit in
    ``wenbo_engine``'s e2e bench since every step rewrites every chunk
    on disk; here durability is a separate, cadence-controlled cost.
    """
    import shutil
    import tempfile

    from ..circuit import library as lib
    from ..runtime import runner
    from ..utils import timing

    cd = lib.non_stabilizer(n, depth=4, seed=7)
    state_gib = 2 * (1 << n) * 4 / 2**30
    # no_wal runs FIRST: per-step programs compile lazily on first
    # execution (inside its step timer), and the later WAL configs hit
    # the executor's compiled-fn cache, so their rows are warm/steady.
    configs = [
        ("no_wal_cold", dict(use_wal=False)),
        ("no_wal", dict(use_wal=False)),
        ("wal_final", dict(use_wal=True, checkpoint_every=10**9)),
        (f"wal_ck{checkpoint_every}",
         dict(use_wal=True, checkpoint_every=checkpoint_every)),
    ]
    rows = []
    for tag, kw in configs:
        wd = tempfile.mkdtemp(prefix=f"qst_waltax_{tag}_")
        timing.reset()
        t0 = time.time()
        try:
            runner.run(cd, wd, mode="window", resume=False,
                       max_levels_per_step=max_levels_per_step, **kw)
            wall = time.time() - t0
            t = timing.snapshot()
            timers, counts = t["timers_s"], t["counts"]
            ck_s = timers.get("runner.checkpoint", 0.0)
            n_ck = counts.get("runner.checkpoint.calls", 0)
            row = {
                "config": tag, "n": n, "gates": len(cd["gates"]),
                "wall_s": round(wall, 2),
                "compile_s": round(timers.get("runner.compile", 0.0), 2),
                "steps_s": round(timers.get("runner.step", 0.0), 4),
                "sync_s": round(timers.get("runner.sync", 0.0), 4),
                "exec_s": round(timers.get("runner.step", 0.0)
                                + timers.get("runner.sync", 0.0), 4),
                "n_steps": counts.get("runner.step.calls", 0),
                "checkpoint_s": round(ck_s, 2),
                "n_checkpoints": n_ck,
                "checkpoint_MB_s": round(
                    n_ck * state_gib * (1 << 30) / 1e6 / ck_s, 1)
                if ck_s else None,
                "projected_checkpoint_s_pcie_10GBs":
                    round(n_ck * state_gib / 10.0, 3),
            }
        except Exception as e:
            row = {"config": tag,
                   "error": f"{type(e).__name__}: {str(e)[:160]}"}
        finally:
            shutil.rmtree(wd, ignore_errors=True)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def panel_scaling(n: int = 28, ks=(2, 4, 8, 16), reps: int = 6,
                  retries: int = 3) -> dict:
    """k chained lane-panel passes; fit t(k) = intercept + slope*k."""
    import jax
    import jax.numpy as jnp

    from ..ops import dense
    from ..ops import pallas_kernels as pk

    P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    W, _ = np.linalg.qr(rng.standard_normal((128, 128))
                        + 1j * rng.standard_normal((128, 128)))

    norm2 = jax.jit(
        lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
    ).lower(P, P).compile()
    init = jax.jit(lambda: dense.zero_state_planar(n)).lower().compile()

    rows = []
    for k in ks:
        def prog(re, im, k=k):
            for _ in range(k):
                re, im = pk.panel_apply_planar(re, im, W,
                                               interpret=interpret)
            return re, im

        row = {"k": k}
        try:
            t0 = time.time()
            compiled = _compile_with_retries(
                lambda: jax.jit(prog, donate_argnums=(0, 1))
                .lower(P, P).compile(), retries)
            row["compile_s"] = round(time.time() - t0, 1)
            state = init()
            state = compiled(*state)  # warm
            float(jax.device_get(norm2(*state)))
            t0 = time.perf_counter()
            for _ in range(reps):
                state = compiled(*state)
            float(jax.device_get(norm2(*state)))
            dt = (time.perf_counter() - t0) / reps
            row.update({"steady_s": round(dt, 5),
                        "ms_per_pass": round(dt / k * 1e3, 3)})
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        rows.append(row)
        print(json.dumps(row), flush=True)

    good = [r for r in rows if "steady_s" in r]
    fit = {}
    if len(good) >= 2:
        ks_ = np.array([r["k"] for r in good], float)
        ts = np.array([r["steady_s"] for r in good], float)
        slope, intercept = np.polyfit(ks_, ts, 1)
        fit = {"slope_ms_per_pass": round(float(slope) * 1e3, 3),
               "intercept_ms": round(float(intercept) * 1e3, 3)}
    return {"rows": rows, "fit": fit}


def diag_variants(n: int = 28, iters: int = 8, reps: int = 3) -> list:
    """Race fused_diag_planar formulations on a big merged QFT run.

    The decisive round-2c measurement: in-kernel (BA, 8, 1)-shaped row
    math occupies whole (8, 128) vregs, so 98 row terms cost 34 ms at
    n=28 against a 5.5 ms kernel floor; XLA-precomputed row cos/sin
    tables + lane-subset group rotations bring the full 147-term pass
    to ~13 ms.
    """
    import jax
    import jax.numpy as jnp

    from . import timeit
    from ..circuit import library as lib
    from ..circuit.panelize import DiagOp, compile_window_schedule
    from ..ops import pallas_kernels as pk

    ops = compile_window_schedule(lib.qft(n), diag_terms_only=True)
    big = max((o for o in ops if isinstance(o, DiagOp)),
              key=lambda o: len(o.terms))
    terms = big.terms
    row = tuple((qs, c) for qs, c in terms
                if qs and all(q >= 7 for q in qs))
    variants = [
        ("full_grouped", dict(terms=terms, group_min=1)),
        ("full_scalar_cross", dict(terms=terms, group_min=10 ** 9)),
        ("row_only", dict(terms=row, group_min=1)),
        ("const_only", dict(terms=(((), 0.3),), group_min=1)),
    ]
    nbytes = 2 * (1 << n) * 4
    rows = []
    for tag, kw in variants:
        def prog(kw=kw):
            re = jnp.full(1 << n, 0.5, jnp.float32)
            im = jnp.full(1 << n, 0.25, jnp.float32)
            for _ in range(iters):
                re, im = jax.lax.optimization_barrier(
                    pk.fused_diag_planar(re, im, **kw))
            return jnp.sum(re * 1e-9) + jnp.sum(im * 1e-9)

        r = {"variant": tag, "n_terms": len(kw["terms"])}
        try:
            c = jax.jit(prog).lower().compile()
            dt = timeit(lambda: float(jax.device_get(c())), reps)
            per = max((dt - 0.044) / iters, 1e-9)
            r.update({"s_per_pass": round(per, 5),
                      "GBs": round(2 * nbytes / per / 1e9, 1)})
        except Exception as e:
            r["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        rows.append(r)
        print(json.dumps(r), flush=True)
    return rows


if __name__ == "__main__":
    import sys

    dev = setup_platform()
    warm_grant()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {"device": str(dev)}
    if which in ("all", "variants"):
        out["nonstab_variants"] = nonstab_variants()
    if which == "wal":
        out["wal_tax"] = wal_tax()
    if which in ("all", "scaling"):
        out["panel_scaling"] = panel_scaling()
    if which in ("all", "diag"):
        out["diag_variants"] = diag_variants()
    print(json.dumps(out, indent=1))
