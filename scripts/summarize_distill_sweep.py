#!/usr/bin/env python3
"""Collect distill-sweep results (runs/sweep.log) into one markdown table.

The sweep driver (runs/distill_sweep.sh) prints, per config, `## <name>
<ckpt>` headers followed by the eval_distilled JSON line. This folds them —
plus the teacher/fewstep baseline block, if present — into a single table
sorted by (student steps, snr) for DEVNOTES.

Usage::

    python scripts/summarize_distill_sweep.py [runs/sweep.log]
"""

import json
import re
import sys


def main(path: str = "runs/sweep.log") -> None:
    rows = []
    name = ckpt = None
    for line in open(path):
        m = re.match(r"## (\S+) (ckpt_step_\d+)", line)
        if m:
            name, ckpt = m.group(1), m.group(2)
            continue
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        res = d.get("results", {})
        if "method" in d:  # eval_distilled line
            rows.append((d["method"], f"{name}/{ckpt}", res))
        else:  # fewstep_quality teacher block
            for method, r in res.items():
                rows.append((method, "teacher", r))

    def steps(method):
        m = re.search(r"(\d+)", method)
        return int(m.group(1)) if m else 0

    rows.sort(key=lambda r: (steps(r[0]), -(r[2].get("snr") or -99)))
    print("| config | method | mse | ssim | cos | mean_err | std_err | snr |")
    print("|---|---|---|---|---|---|---|---|")
    for method, src, r in rows:
        print(f"| {src} | {method} | {r['mse']:.3f} | {r['ssim']:.3f} | "
              f"{r['avg_cos_sim']:.3f} | {r['mean_error']:.3f} | "
              f"{r['std_error']:.3f} | {r['snr']:.2f} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
