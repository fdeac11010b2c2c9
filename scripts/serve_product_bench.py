#!/usr/bin/env python3
"""Steady-state serve throughput of a REAL checkpoint at its own grid.

Round-5 (VERDICT r4 #4 "Done" + #2's serve headline): bench.py's serve
extra uses a random-init model pinned at DDIM-50; this drives the same
``serve_loop`` (batched wav requests, IO thread pipelined behind the
device chain, uncompressed-npz default) with a product checkpoint — a
distilled student serves at its ``distilled_steps`` grid, single forward
per step, folded guidance — against real split clips.

Usage::

    python scripts/serve_product_bench.py <ckpt_dir> <npz_dir>
        [n_req=4] [batch=8] [--compress]
"""

import io
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(ckpt_dir, npz_dir, n_req=4, batch=8, compress=False):
    from lm2a_tpu.cli.serve import serve_loop
    from lm2a_tpu.inference.sample import load_models
    from lm2a_tpu.vocoder import Vocoder

    import jax.numpy as jnp
    import tempfile

    models = load_models(ckpt_dir)
    print(f"ckpt {ckpt_dir}: distilled_steps={models.distilled_steps} "
          f"folded_guidance={models.folded_guidance} "
          f"std_calibration={models.std_calibration}", file=sys.stderr)

    files = sorted(f for f in os.listdir(npz_dir)
                   if f.endswith(".npz") and f != "motion_stats.npz")
    random.Random(3).shuffle(files)
    clips = [os.path.join(npz_dir, f) for f in files[:batch]]
    voc = Vocoder(weights_path=None, compute_dtype=jnp.bfloat16)

    with tempfile.TemporaryDirectory() as td:
        warm = [json.dumps({"npz": clips, "id": "warm", "wav": True,
                            "out_dir": os.path.join(td, "out")})]
        t0 = time.perf_counter()
        serve_loop(models, warm, io.StringIO(), vocoder=voc,
                   out_dir=os.path.join(td, "out"), compress_npz=compress)
        print(f"warm (compile) {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        pull_t, reply_t = {}, {}
        req_objs = [{"npz": clips, "id": f"r{i}", "seed": i, "wav": True,
                     "out_dir": os.path.join(td, "out")}
                    for i in range(n_req)]

        def timed_requests():
            for r in req_objs:
                pull_t[r["id"]] = time.perf_counter()
                yield json.dumps(r)

        class TimedOut(io.StringIO):
            def write(self, s):
                r = super().write(s)
                if "\n" in s:
                    for line in s.strip().splitlines():
                        try:
                            rid = json.loads(line).get("id")
                        except Exception:
                            continue
                        reply_t.setdefault(rid, time.perf_counter())
                return r

        out = TimedOut()
        t0 = time.perf_counter()
        served = serve_loop(models, timed_requests(), out, vocoder=voc,
                            out_dir=os.path.join(td, "out"),
                            compress_npz=compress)
        dt = time.perf_counter() - t0
        lats = sorted(reply_t[i] - pull_t[i] for i in pull_t if i in reply_t)
        mid = len(lats) // 2
        p50 = (lats[mid] if len(lats) % 2
               else 0.5 * (lats[mid - 1] + lats[mid])) if lats else None
        cps = served * len(clips) / dt
        print(json.dumps({
            "ckpt": ckpt_dir, "distilled_steps": models.distilled_steps,
            "n_req": served, "batch": len(clips), "compress": compress,
            "wall_s": round(dt, 3), "clips_per_s": round(cps, 2),
            "x_realtime": round(cps * 6.0, 1),
            "latency_p50_s": round(p50, 3) if p50 else None,
            "latency_max_s": round(lats[-1], 3) if lats else None,
        }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--compress"]
    if len(args) < 2:
        sys.exit(__doc__)
    main(args[0], args[1],
         int(args[2]) if len(args) > 2 else 4,
         int(args[3]) if len(args) > 3 else 8,
         compress="--compress" in sys.argv)
