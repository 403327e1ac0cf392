"""Scaling-efficiency proxy on the virtual CPU mesh.

Real multi-chip hardware is not reachable from this environment (one
v5e behind a relay), so the data-parallel scaling story is measured as
a PROXY on the n-virtual-device CPU mesh: fixed total work, swept over
mesh sizes, with the per-shard compute and the collective merge timed
separately (the same jitted program with and without its collectives).
On real ICI the collective term is bounded by the table/count bytes
(psum of 4^k ints, all_gather of cap-bounded tables), which this proxy
reports so the expected efficiency at N chips can be projected:

    efficiency(N) ~ t_local(work/N) / (t_local(work/N) + t_collective(N))

Run: python -m bionumpy_tpu.parallel.scaling  (or see
tests/test_parallel.py::test_scaling_proxy).
"""
from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


def _sharded_local_only(mesh, k: int, cap: int):
    """The sparse-count step WITHOUT the cross-shard merge: per-shard
    compacted tables stay sharded (no all_gather / psum)."""
    import jax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from .sparse_parallel import _local_table

    @partial(shard_map, mesh=mesh,
             in_specs=(P("dp", None), P("dp", None), P("dp")),
             out_specs=(P("dp", None), P("dp", None), P("dp", None)))
    def step(words_b, ends_b, n_true_b):
        lo, hi, cnt, _meta = _local_table(words_b[0], ends_b[0],
                                          n_true_b[0], k, cap)
        return lo[None], hi[None], cnt[None]

    return jax.jit(step)


def measure(n_devices_list=(1, 2, 4, 8), n_bases: int = 1 << 20,
            k: int = 31, cap: int = 1 << 13, iters: int = 2) -> list:
    """Fixed-total-work sweep; returns one record per mesh size with the
    local-compute and with-collective wall times."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from . import create_mesh
    from .sparse_parallel import shard_packed_reads, \
        sharded_sparse_count_step

    rng = np.random.default_rng(5)
    read_len = 150
    n_reads = n_bases // read_len
    lengths = np.full(n_reads, read_len)
    flat = rng.integers(0, 4, lengths.sum()).astype(np.uint8)

    records = []
    for n_dev in n_devices_list:
        if n_dev > jax.device_count():
            continue
        mesh = create_mesh(n_dev)
        words, ends, n_true = shard_packed_reads(flat, lengths, n_dev)
        put = lambda a, spec: jax.device_put(  # noqa: E731
            jnp.asarray(a), NamedSharding(mesh, spec))
        w = put(words, P("dp", None))
        e = put(ends, P("dp", None))
        nt = put(n_true, P("dp"))

        local = _sharded_local_only(mesh, k, cap)
        full = sharded_sparse_count_step(mesh, k, cap)

        def timed(fn):
            out = jax.block_until_ready(fn(w, e, nt))
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn(w, e, nt))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_local = timed(local)
        t_full = timed(full)
        records.append({
            "n_devices": n_dev,
            "t_local_s": round(t_local, 4),
            "t_with_collectives_s": round(t_full, 4),
            "collective_overhead_s": round(max(t_full - t_local, 0), 4),
            "bytes_gathered": int(3 * 4 * cap * n_dev),
        })
    if records:
        import os
        base = records[0]["t_local_s"] or 1e-9
        n_cores = os.cpu_count() or 1
        # Conservative ICI floor (v5e 1D ring is far faster); the
        # collective traffic is cap-bounded tables, so the projected
        # term is tiny next to per-shard compute.
        ici_bw = 10e9
        for r in records:
            n = r["n_devices"]
            r["host_cpu_count"] = n_cores
            r["local_speedup_vs_1dev"] = round(base / max(
                r["t_local_s"], 1e-9), 2)
            r["efficiency_proxy"] = round(
                base / max(r["t_with_collectives_s"], 1e-9) / n, 3)
            # On real chips each shard owns a full chip, so the local
            # term scales by construction (shards are independent);
            # what ICI adds is the measured-bytes collective:
            t_shard = base / n
            r["projected_ici_efficiency"] = round(
                t_shard / (t_shard + r["bytes_gathered"] / ici_bw), 3)
            r["note"] = (
                "efficiency_proxy is CORE-BOUND on this host "
                f"({n_cores} CPUs emulate {n} devices); "
                "projected_ici_efficiency uses perfect local scaling "
                "(independent shards, one chip each) plus the measured "
                "collective bytes over a conservative 10 GB/s ICI")
    return records


if __name__ == "__main__":
    import os
    import jax
    from jax._src import xla_bridge
    if not xla_bridge.backends_are_initialized():
        jax.config.update("jax_platforms", "cpu")
        if "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            jax.config.update("jax_num_cpu_devices", 8)
    for rec in measure():
        print(json.dumps(rec))
