"""Round-5 chip queue: run the remaining A/B harnesses in ONE process so
the 4-7 min cold jax/tunnel init is paid once (r4 queue-script pattern).

Sections (each wrapped; a failure doesn't kill the rest):
  crossover_ab  int8-vs-bf16 n_rows thresholds
  split_ab      split-pool serving effect
  longctx_ab    16k/32k paired windows + 64k first point

Run: python scripts/r5_queue.py [sections...]
"""
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SECTIONS = ["crossover_ab", "split_ab", "longctx_ab", "profile_step:--batch32"]


def main():
    names = sys.argv[1:] or SECTIONS
    for name in names:
        name, _, extra = name.partition(":")
        print(f"\n==== section {name} {extra} ====", flush=True)
        t0 = time.time()
        try:
            mod = importlib.import_module(name)
            sys.argv = [name] + ([extra] if extra else [])
            mod.main()
            print(f"==== {name} done ({time.time()-t0:.0f}s) ====", flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback

            print(f"==== {name} FAILED {type(e).__name__}: {e} ====",
                  flush=True)
            traceback.print_exc()
        # free any device arrays the section leaked via module globals
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
