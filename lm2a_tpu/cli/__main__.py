"""Unified CLI dispatcher: ``python -m lm2a_tpu.cli <command> [args]``.

Commands map 1:1 onto the reference's entry-point scripts (SURVEY.md §1 L3/L5):

  preprocess         preprocess.py           raw tree -> npz shards
  split              datasetcode/newsplit_npz.py
  pack               (new) mmap-pack a split for fast training
  train              train.py
  distill            (new) progressive distillation to a few-step student
  sample             sample.py
  serve              (new) persistent sampling server (JSON lines on stdio)
  val                val.py                  mel-domain assessment
  evaluate           evaluate_all.py         wav-domain metrics
  towav              sometest/testwav.py + newwav.py
  inspect-npz        sometest/testnpz.py
  inspect-train-log  sometest/inspect_train_log.py
  graph              sometest/graph.py
"""

import sys

COMMANDS = {
    "preprocess": "lm2a_tpu.cli.preprocess",
    "split": "lm2a_tpu.cli.split",
    "pack": "lm2a_tpu.cli.pack",
    "train": "lm2a_tpu.cli.train",
    "distill": "lm2a_tpu.cli.distill",
    "sample": "lm2a_tpu.cli.sample",
    "serve": "lm2a_tpu.cli.serve",
    "val": "lm2a_tpu.cli.val",
    "evaluate": "lm2a_tpu.cli.evaluate",
    "towav": "lm2a_tpu.cli.towav",
    "inspect-npz": "lm2a_tpu.cli.inspect_npz",
    "inspect-train-log": "lm2a_tpu.cli.inspect_train_log",
    "graph": "lm2a_tpu.cli.graph",
}


def _enable_compile_cache():
    """Persistent XLA compile cache for every CLI entry point.

    Compiles through the remote relay cost minutes (DEVNOTES); without this
    each `lm2a_tpu.cli train/sample` invocation re-paid them. Override the
    location with LM2A_CACHE_DIR; disable with LM2A_CACHE_DIR=''.
    """
    import os

    cache = os.environ.get(
        "LM2A_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "lm2a_tpu", "jax_cache"),
    )
    if not cache:
        return
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never block the CLI on cache setup
        print(f"[cli] compile cache disabled: {e}", file=sys.stderr)


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        print("usage: python -m lm2a_tpu.cli <command> [args]")
        print("commands:", ", ".join(COMMANDS))
        raise SystemExit(0 if len(sys.argv) >= 2 else 1)
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        raise SystemExit(f"unknown command {cmd!r}; choose from {list(COMMANDS)}")
    import importlib

    _enable_compile_cache()
    mod = importlib.import_module(COMMANDS[cmd])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
