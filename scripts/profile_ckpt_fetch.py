"""Measure checkpoint-sized device<->host transfers through the axon relay.

ROADMAP #11: the flagship TrainState is ~3.2 GB and a save's blocking cost
is its device->host fetch (4.5-8 min measured round 2); resume pays the
mirror-image upload. A single transfer stream through the relay tops out
far below link bandwidth, so this script A/Bs one batched
``jax.device_get`` / ``jax.device_put`` against thread-pool overlapped
per-leaf transfers (``training/checkpoint.fetch_tree``).

Measurement discipline (DEVNOTES): fresh random data per rep (the relay
dedupes identical payloads), interleaved arms over multiple cycles, first
cycle reported but discounted.

Usage:
    python scripts/profile_ckpt_fetch.py [--mb 256] [--leaves 64] [--cycles 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256, help="total tree size")
    ap.add_argument("--leaves", type=int, default=64)
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8, 16])
    ap.add_argument("--upload", action="store_true",
                    help="also measure host->device (resume direction)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lm2a_tpu.training.checkpoint import fetch_tree

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    per_leaf = args.mb * (1 << 20) // args.leaves // 4  # fp32 elements
    shape = (per_leaf,)

    @jax.jit
    def make_tree(key):
        keys = jax.random.split(key, args.leaves)
        return {f"leaf{i:04d}": jax.random.normal(keys[i], shape, jnp.float32)
                for i in range(args.leaves)}

    total_mb = args.leaves * per_leaf * 4 / (1 << 20)
    print(f"tree: {args.leaves} leaves x {per_leaf * 4 / (1 << 20):.1f} MB "
          f"= {total_mb:.0f} MB")

    def put_tree(host, workers):
        if workers <= 1:
            out = jax.device_put(host)
        else:
            from concurrent.futures import ThreadPoolExecutor

            flat, treedef = jax.tree_util.tree_flatten(host)
            with ThreadPoolExecutor(max_workers=workers) as ex:
                leaves = list(ex.map(jax.device_put, flat))
            out = jax.tree_util.tree_unflatten(treedef, leaves)
        jax.block_until_ready(out)
        # value fetch: block_until_ready is unreliable through the relay
        _ = float(jnp.abs(out[next(iter(out))][:8]).sum())
        return out

    seed = 0
    results = {w: [] for w in args.workers}
    up_results = {w: [] for w in args.workers}
    for cycle in range(args.cycles):
        for w in args.workers:
            seed += 1
            tree = make_tree(jax.random.key(seed))
            jax.block_until_ready(tree)
            _ = float(jnp.abs(tree["leaf0000"][:8]).sum())

            t0 = time.perf_counter()
            host = fetch_tree(tree, w)
            dt = time.perf_counter() - t0
            # device_get returns numpy; touching it proves arrival
            assert isinstance(next(iter(host.values())), np.ndarray)
            results[w].append(dt)
            print(f"  cycle {cycle} fetch workers={w:3d}: {dt:7.2f} s "
                  f"({total_mb / dt:7.1f} MB/s)", flush=True)

            if args.upload:
                # fresh host payload per rep (dedupe trap)
                host2 = {k: v + np.float32(seed) for k, v in host.items()}
                del tree
                t0 = time.perf_counter()
                put_tree(host2, w)
                dt = time.perf_counter() - t0
                up_results[w].append(dt)
                print(f"  cycle {cycle} put   workers={w:3d}: {dt:7.2f} s "
                      f"({total_mb / dt:7.1f} MB/s)", flush=True)

    print("\n== converged (last-cycle) summary ==")
    for w in args.workers:
        line = (f"workers={w:3d}: fetch {results[w][-1]:7.2f} s "
                f"({total_mb / results[w][-1]:7.1f} MB/s)")
        if args.upload:
            line += (f" | put {up_results[w][-1]:7.2f} s "
                     f"({total_mb / up_results[w][-1]:7.1f} MB/s)")
        print(line)


if __name__ == "__main__":
    main()
