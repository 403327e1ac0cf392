import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from functools import partial
    dev = jax.devices()[0]
    n = 1 << 25
    cap = 1 << 21
    rng = np.random.default_rng(0)
    # synthetic sorted-ish stream with ~1M runs
    vals = np.sort(rng.integers(0, 1 << 30, n, dtype=np.uint32))
    v_d = jax.device_put(vals, dev)

    @jax.jit
    def stable_resort(v):
        is_new = jnp.concatenate([jnp.ones(1, bool), v[1:] != v[:-1]])
        pos = jnp.arange(n, dtype=jnp.int32)
        _, p2 = jax.lax.sort(((~is_new).astype(jnp.uint32), pos),
                             num_keys=1, is_stable=True)
        starts = p2[:cap]
        return jnp.take(v, starts).sum() + starts.sum()

    @jax.jit
    def nonzero_size(v):
        is_new = jnp.concatenate([jnp.ones(1, bool), v[1:] != v[:-1]])
        starts = jnp.nonzero(is_new, size=cap, fill_value=n - 1)[0] \
            .astype(jnp.int32)
        return jnp.take(v, starts).sum() + starts.sum()

    @jax.jit
    def scatter_compact(v):
        is_new = jnp.concatenate([jnp.ones(1, bool), v[1:] != v[:-1]])
        slot = jnp.where(is_new, jnp.cumsum(is_new.astype(jnp.int32)) - 1,
                         cap)
        pos = jnp.arange(n, dtype=jnp.int32)
        starts = jnp.zeros(cap, jnp.int32).at[slot].set(pos, mode="drop")
        return jnp.take(v, starts).sum() + starts.sum()

    for name, fn in [("stable-resort", stable_resort),
                     ("nonzero(size)", nonzero_size),
                     ("cumsum+scatter", scatter_compact)]:
        out = int(np.asarray(fn(v_d)))
        best = 9e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = int(np.asarray(fn(v_d)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.0f} ms", flush=True)

main()
