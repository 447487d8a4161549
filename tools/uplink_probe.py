"""Measure the relay's upload bandwidth BEFORE vs AFTER the first fetch.

CLAUDE.md/BENCH_NOTES: the FIRST device->host fetch permanently degrades
transfers (~63MB/s flat-u8 uploads; ~1.5GB/s before). If true, a batch job
that uploads its whole input BEFORE its first result fetch rides the fast
link for every upload — the basis of bench.py's deferred mode. This probe
quantifies both regimes in one fresh process:

  phase A: upload N distinct flat-u8 buffers, run a trivial consumer over
           all of them, ONE tiny fetch at the end (the fetch makes the
           timing honest; every upload precedes it).
  phase B: identical, after the process has fetched (degraded regime).

Run: timeout --signal=INT 900 python tools/uplink_probe.py [MB] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 13.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    size = int(mb * 1e6)
    rng = np.random.RandomState(0)
    bufs = [rng.randint(0, 255, size, np.uint8) for _ in range(n)]

    @jax.jit
    def consume(*xs):
        # touch one element of every buffer (distinct offsets defeat relay
        # memoization; the add chain forces all uploads to complete)
        acc = jnp.int32(0)
        for i, x in enumerate(xs):
            acc = acc + x[i * 131].astype(jnp.int32)
        return acc

    print("devices:", jax.devices(), flush=True)

    def phase(tag):
        t0 = time.perf_counter()
        devs = [jnp.asarray(b) for b in bufs]
        t_up = time.perf_counter()
        val = int(consume(*devs))          # the ONLY fetch of the phase
        t1 = time.perf_counter()
        total = t1 - t0
        print(f"[{tag}] upload-dispatch {t_up - t0:.3f}s, "
              f"fetch-inclusive total {total:.3f}s "
              f"-> {n * mb / total:.0f} MB/s effective (val={val})",
              flush=True)

    # warm the consumer WITHOUT fetching (compile happens here; the
    # execution ack may be early — irrelevant, phase A re-times honestly)
    devs = [jnp.asarray(b) for b in bufs]
    consume(*devs).block_until_ready()
    print("[warm] compile done, no fetch issued yet", flush=True)

    for b in bufs:
        b[4242] ^= 1                      # distinct content vs the warm pass
    phase("A pre-fetch-regime")   # first real fetch happens INSIDE phase A
    for i in range(3):
        for b in bufs:
            b[(i * 7919) % size] ^= 1     # new content every phase
        phase(f"B post-fetch {i}")


if __name__ == "__main__":
    main()
