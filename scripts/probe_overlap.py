"""Does a device->host fetch of a COMPLETED buffer overlap execution of
later-dispatched programs on the serving transport?

The speculative-deskew win depends on the answer: with overlap, the blob
transfer (~90 ms at ~20 MB/s) hides under the deskew program's execution;
without it, the win reduces to the deleted dispatch round trip + host
contour time. Protocol: fetch a ~2 MB buffer alone vs with a calibrated
~200 ms program dispatched after it (the buffer is already computed in
both cases); interleaved repeats, min + median per arm."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from sbb_textline_detection_tpu.core import jaxenv

jaxenv.enable_compilation_cache()
print("[probe] devices:", jax.devices(), flush=True)


@jax.jit
def make_blob(x):
    # ~2 MB uint8, like the packed region blob
    return (x.reshape(-1) * 255).astype(jnp.uint8)


def heavy_fn(n):
    @jax.jit
    def heavy(a):
        def body(i, m):
            return m @ a
        return jax.lax.fori_loop(0, n, body, a)[0, 0]
    return heavy


x = jnp.asarray(np.random.default_rng(0).uniform(size=(2048, 1024)
                                                 ).astype(np.float32))
a = jnp.asarray(np.random.default_rng(1).uniform(size=(2048, 2048)
                                                 ).astype(np.float32))

# calibrate heavy to ~200 ms
heavy = heavy_fn(8)
np.asarray(heavy(a))  # compile+load
for n in (8, 32, 128, 512, 2048):
    heavy = heavy_fn(n)
    t0 = time.time()
    np.asarray(heavy(a))
    t1 = time.time()
    np.asarray(heavy(a))
    dt = time.time() - t1
    print(f"[probe] heavy n={n}: first {t1-t0:.3f}s warm {dt:.3f}s",
          flush=True)
    if dt > 0.15:
        break
heavy_t = dt
blob = make_blob(x)
np.asarray(blob)  # warm the fetch path + program

alone, withq = [], []
for rep in range(6):
    # arm A: fetch alone
    blob = make_blob(x)
    np.asarray(blob[:8])   # force completion of make_blob itself
    t0 = time.time()
    np.asarray(blob)
    alone.append(time.time() - t0)
    # arm B: fetch with a heavy program dispatched after the blob program
    blob = make_blob(x)
    h = heavy(a)
    t0 = time.time()
    np.asarray(blob)
    withq.append(time.time() - t0)
    np.asarray(h)          # drain
    print(f"[probe] rep {rep}: alone {alone[-1]*1e3:.1f}ms "
          f"with-heavy {withq[-1]*1e3:.1f}ms", flush=True)

print(f"[probe] heavy exec ~{heavy_t*1e3:.0f}ms; fetch alone "
      f"min/med {min(alone)*1e3:.1f}/{np.median(alone)*1e3:.1f}ms; "
      f"with heavy {min(withq)*1e3:.1f}/{np.median(withq)*1e3:.1f}ms",
      flush=True)
delta = np.median(withq) - np.median(alone)
print(f"[probe] verdict: fetch {'WAITS BEHIND' if delta > 0.6*heavy_t else 'OVERLAPS'} "
      f"later-dispatched programs (delta {delta*1e3:.0f}ms vs heavy "
      f"{heavy_t*1e3:.0f}ms)", flush=True)
