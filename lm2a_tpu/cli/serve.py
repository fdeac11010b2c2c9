"""Persistent serving loop: load models once, answer many sampling requests.

Extension beyond the reference (whose ``sample.py`` pays model load + schedule
setup per invocation): a long-lived process reads one JSON request per line on
stdin and writes one JSON response per line on stdout. Model parameters load
once; the compiled sampler chain is cached per request geometry
(mel_t, steps, guidance, method, batch) inside ``LoadedModels``, so every
request after the first with a given geometry costs only device time
(~0.7 s for the flagship 1000-step CFG chain on one v5e chip, ~0.1 s at
DDIM-50 — DEVNOTES.md headline numbers).

Request fields (one JSON object per line on stdin):
    npz         input clip path, or a LIST of paths — a list is served as
                batched generation (clips grouped by mel length, one compiled
                chain per group; the throughput path) (required unless "cmd")
    id          echoed back in the response (optional)
    out_dir     overrides the server default (optional)
    steps       schedule length        (default: server --steps / checkpoint)
    guidance    CFG weight             (default: server --guidance / ckpt)
    method      "ddpm" | "ddim"        (default: server --method)
    ddim_steps  DDIM sampler steps     (default: server --ddim_steps)
    seed        noise seed             (default: request counter)
    png         also write gen/real PNGs (default: false — serving skips
                matplotlib; the npz is the product)
    cmd         "quit" ends the loop; "ping" answers without sampling

Response (one JSON object per line on stdout):
    {"id": ..., "ok": true, "out": "<base>_gen.npz", "seconds": 0.84}
    {"id": ..., "ok": true, "out": ["a_gen.npz", "b_gen.npz"], "seconds": ...}
    {"id": ..., "ok": false, "error": "..."}
EOF on stdin also ends the loop. Diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser(p=None):
    p = p or argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="checkpoint dir OR reference torch .pt file")
    p.add_argument("--out_dir", default="serve_out",
                   help="default output dir (per-request out_dir overrides)")
    p.add_argument("--steps", type=int, default=None,
                   help="default schedule length (default: ckpt timesteps)")
    p.add_argument("--guidance", type=float, default=None,
                   help="default CFG weight (default: ckpt guidance, else 1.0)")
    p.add_argument("--method", default="ddpm", choices=["ddpm", "ddim"])
    p.add_argument("--ddim_steps", type=int, default=None)
    p.add_argument("--warmup_t", type=int, default=None,
                   help="pre-compile the sampler chain for this mel length "
                        "before accepting requests (e.g. 516)")
    return p


def serve_loop(models, requests, out_stream, *, out_dir="serve_out",
               steps=None, guidance=None, method="ddpm", ddim_steps=None):
    """Handle an iterable of JSON-line requests; write JSON-line responses.

    Returns the number of successfully served sampling requests. Separated
    from the CLI so tests can drive it with in-memory streams.
    """
    from lm2a_tpu.inference import sample_batch_from_npz, sample_from_npz

    served = 0
    for n, line in enumerate(requests):
        line = line.strip()
        if not line:
            continue
        req_id = None
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
            req_id = req.get("id")
            cmd = req.get("cmd")
            if cmd == "quit":
                _reply(out_stream, {"id": req_id, "ok": True, "bye": True})
                break
            if cmd == "ping":
                _reply(out_stream, {"id": req_id, "ok": True, "pong": True})
                continue
            if "npz" not in req:
                raise ValueError("request needs 'npz' (or 'cmd')")

            t0 = time.perf_counter()
            if isinstance(req["npz"], (list, tuple)):
                out = sample_batch_from_npz(
                    list(req["npz"]), None, req.get("out_dir", out_dir),
                    steps=req.get("steps", steps),
                    guidance_weight=req.get("guidance", guidance),
                    method=req.get("method", method),
                    seed=int(req.get("seed", n)),
                    ddim_steps=req.get("ddim_steps", ddim_steps),
                    batch_size=int(req.get("batch_size", 8)),
                    models=models,
                )
            else:
                out = sample_from_npz(
                    req["npz"], None, req.get("out_dir", out_dir),
                    steps=req.get("steps", steps),
                    guidance_weight=req.get("guidance", guidance),
                    method=req.get("method", method),
                    seed=int(req.get("seed", n)),
                    ddim_steps=req.get("ddim_steps", ddim_steps),
                    save_png=bool(req.get("png", False)),
                    models=models,
                )
            served += 1
            _reply(out_stream, {
                "id": req_id, "ok": True, "out": out,
                "seconds": round(time.perf_counter() - t0, 3),
            })
        except Exception as e:  # a bad request must not kill the server
            _reply(out_stream, {"id": req_id, "ok": False,
                                "error": f"{type(e).__name__}: {e}"})
    return served


def _reply(stream, obj) -> None:
    stream.write(json.dumps(obj) + "\n")
    stream.flush()


def main(args=None):
    args = build_parser().parse_args(args)
    from lm2a_tpu.inference import load_models

    t0 = time.perf_counter()
    models = load_models(args.ckpt)
    print(f"[serve] loaded {args.ckpt} in {time.perf_counter() - t0:.1f}s "
          f"(timesteps={models.timesteps})", file=sys.stderr)

    if args.warmup_t:
        from lm2a_tpu.inference.sample import generate_mel
        import numpy as np

        t0 = time.perf_counter()
        generate_mel(
            models,
            np.zeros((args.warmup_t, models.cfg.model.motion_dim), np.float32),
            np.zeros((args.warmup_t, models.cfg.model.text_dim), np.float32),
            args.warmup_t, steps=args.steps, guidance_weight=args.guidance,
            method=args.method, ddim_steps=args.ddim_steps,
        )
        print(f"[serve] warmup T={args.warmup_t} compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    print("[serve] ready — one JSON request per line on stdin", file=sys.stderr)
    served = serve_loop(
        models, sys.stdin, sys.stdout, out_dir=args.out_dir,
        steps=args.steps, guidance=args.guidance, method=args.method,
        ddim_steps=args.ddim_steps,
    )
    print(f"[serve] done: {served} requests served", file=sys.stderr)


if __name__ == "__main__":
    main()
