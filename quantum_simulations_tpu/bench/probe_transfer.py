"""Probe host<->device transfer paths (run on real hardware).

The spill tier (``runtime/spill.py``) streams stripes host<->HBM both
ways; its achievable rate is set by the host-to-device DMA path, so
this probe measures what the current backend supports and at what
bandwidth.  On a production TPU host that path is PCIe (tens of GB/s,
the reference's own host-RAM-to-disk analogue is
``wenbo_engine/bench/io.py``); on the axon dev tunnel it is a network
hop.

Measured 2026-08-19 on the v5e-via-tunnel dev setup (exact sizes
probed — no extrapolation; warmed runs, compile excluded):

* f32 upload (device_put via jit arg):   OK — 30 / 45 / 41 MB/s at
  4 / 64 / 512 MB
* complex64 upload (8 MB probed):        UNIMPLEMENTED
* f32 fetch at 64 MB and 512 MB:         UNIMPLEMENTED (<= 32 MB ok)
* complex64 fetch (8 MB probed):         UNIMPLEMENTED

CAUTION: a failed (UNIMPLEMENTED) transfer poisons the SAME process's
subsequent fetches — after the failing fetch probes above, even a
scalar device_get raises UNIMPLEMENTED.  Run this probe in its own
process, never before a real bench.

=> streaming a 16 GiB n=31 stripe set through the tunnel would take
~7 min per direction per pass — a dev-setup artifact, not a framework
or TPU limit.  Within the envelope, though, the spill tier DOES run on
the real chip: ``spill_bw.real_chip`` streams a full n=24 state
host<->HBM via ``transfer='f32'`` stripes (<= 32 MB fetch slices) and
verifies on-device against the in-HBM engine (BENCH_LOCAL.json
``spill_tier.real_chip``); larger-than-HBM scale is demonstrated
end-to-end on the CPU backend (full 125 GiB host DRAM).
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)

    # Warm the grant.
    warm = jax.jit(lambda: jnp.sum(jnp.ones((128, 128), jnp.float32)))
    print("warm:", float(jax.device_get(warm())))

    results = {}

    # 1. f32 upload via jitted-identity argument (the device_put path).
    # Each shape compiles fresh, so call once UNTIMED to trace+compile,
    # then time a second call: the timed region is pure transfer.
    f = jax.jit(lambda x: jnp.sum(x))
    for mb in (4, 64, 512):
        a = np.ones(mb * 1 << 18, np.float32)
        try:
            float(jax.device_get(f(a)))  # warmup: trace + compile + 1st DMA
            t0 = time.time()
            s = float(jax.device_get(f(a)))
            dt = time.time() - t0
            results[f"f32_up_{mb}MB"] = f"OK {mb/dt:.0f} MB/s (sum={s:.0f})"
            print(f"f32_up_{mb}MB:", results[f"f32_up_{mb}MB"], flush=True)
        except Exception as e:
            results[f"f32_up_{mb}MB"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
            print(f"f32_up_{mb}MB:", results[f"f32_up_{mb}MB"], flush=True)
            break

    # 2. complex64 upload via jit arg.
    fc = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    a = np.ones(1 << 20, np.complex64)
    try:
        t0 = time.time()
        s = float(jax.device_get(fc(a)))
        results["c64_up_8MB"] = f"OK ({time.time()-t0:.2f}s, sum={s:.0f})"
    except Exception as e:
        results["c64_up_8MB"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
    print("c64_up_8MB:", results["c64_up_8MB"], flush=True)

    # 3. f32 fetch bandwidth at stripe sizes.  Probe each size
    # independently (no break): a 64 MB failure says nothing about
    # 512 MB on a different backend rev.
    for mb in (64, 512):
        g = jax.jit(lambda mb=mb: jnp.ones(mb * 1 << 18, jnp.float32) * 2.0)
        try:
            out = g()
            out.block_until_ready()
            t0 = time.time()
            h = np.asarray(jax.device_get(out))
            dt = time.time() - t0
            results[f"f32_down_{mb}MB"] = f"OK {mb/dt:.0f} MB/s (h0={h[0]})"
        except Exception as e:
            results[f"f32_down_{mb}MB"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
        print(f"f32_down_{mb}MB:", results[f"f32_down_{mb}MB"], flush=True)

    # 4. complex64 fetch.
    gc = jax.jit(lambda: jnp.zeros((1 << 20,), jnp.complex64))
    try:
        out = gc()
        h = np.asarray(jax.device_get(out))
        results["c64_down_8MB"] = "OK"
    except Exception as e:
        results["c64_down_8MB"] = f"FAIL {type(e).__name__}: {str(e)[:120]}"
    print("c64_down_8MB:", results["c64_down_8MB"], flush=True)

    print("\n== summary ==")
    for k, v in results.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
