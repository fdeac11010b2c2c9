"""Collective-communication audit: what does GSPMD actually insert?

The sharded steps in this package are *correctness*-tested against the
replicated math, but shardings also determine the collectives XLA inserts
(all-gathers from column-parallel layer boundaries, halo
collective-permutes from sequence-sharded convs, the gradient all-reduce).
This module counts them from the compiled HLO so layout decisions are made
against measurements, not guesses — the scaling-book loop: annotate,
compile, inspect, iterate. Results for the flagship steps are recorded in
``docs/SCALING.md``.

No reference analogue (the reference is single-GPU, SURVEY §2.3).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Any, Dict

# HLO opcodes that move data between devices.
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def collective_counts(compiled) -> Dict[str, int]:
    """Count collective ops in a ``jax.stages.Compiled``'s optimized HLO.

    Start variants (``all-reduce-start`` from async pairs) are folded into
    their base opcode; ``-done`` ops are ignored (each pair is one transfer).
    """
    text = compiled.as_text()
    counts: Counter = Counter()
    # An op instance is the opcode followed by '(' and preceded by whitespace
    # (`= f32[...] all-reduce(...)` or tuple-shaped `= (...) all-reduce(...)`);
    # operand references look like `(%all-reduce.187)` and don't match.
    pat = re.compile(r"(?<=\s)(" + "|".join(COLLECTIVE_OPS) + r")(-start)?\(")
    for m in pat.finditer(text):
        counts[m.group(1)] += 1
    return dict(counts)


def audit(jitted_fn, *args, **kwargs) -> Dict[str, Any]:
    """Compile ``jitted_fn`` for ``args`` and summarize its communication.

    Returns ``{"collectives": {op: count}, "total": N, "bytes_accessed": B}``
    (bytes from XLA cost analysis when available).
    """
    lowered = jitted_fn.lower(*args, **kwargs)
    compiled = lowered.compile()
    counts = collective_counts(compiled)
    out: Dict[str, Any] = {
        "collectives": counts,
        "total": sum(counts.values()),
    }
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out["bytes_accessed"] = ca.get("bytes accessed")
        out["flops"] = ca.get("flops")
    except Exception:
        pass
    return out
