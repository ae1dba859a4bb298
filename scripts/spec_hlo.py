"""Dump + analyze the optimized HLO of the on-device PLD spec executable.

The r5 profile_spec trace showed ~40% of spec dispatch time in
copy-start/slice-start ops over WEIGHT-shaped buffers (u8[2,2048,28672]
gateup stacks, f32[*,448,4096] ffn_down scales). This script compiles the
same executable, then reports for each copy/slice of a weight-sized buffer
which computation it sits in (entry = per-dispatch cost; while body = per
round) and what it copies, so the fix targets the real cause.

Run: python scripts/spec_hlo.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine, GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline
    from mistralrs_tpu.pipeline.speculative import PromptLookupPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    from mistralrs_tpu.quant.fuse import fuse_decoder_params, requant_q6k_params

    params = fuse_decoder_params(params)
    params = requant_q6k_params(params)

    gamma = int(os.environ.get("MISTRALRS_PROFILE_GAMMA", "3"))
    R = int(os.environ.get("MISTRALRS_PROFILE_ROUNDS", "16"))
    pc = PipelineConfig(page_size=16, num_pages=256, max_seqs=2,
                        max_model_len=2048, prefill_buckets=(64,))
    pld = PromptLookupPipeline(
        TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
        gamma=gamma, spec_rounds=R)
    eng = Engine(pld, eos_token_ids=set(), prefix_cache=False)

    # capture the real spec_multi args from the first dispatch
    captured = {}
    real_build = pld._build_spec_multi_fn

    def capturing_build():
        fn = real_build()

        def wrapper(*args):
            if "args" not in captured:
                captured["args"] = args
                captured["fn"] = fn
            return fn(*args)

        return wrapper

    pld._build_spec_multi_fn = capturing_build
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    eng.generate(prompt, SamplingParams(max_len=8))
    assert "args" in captured, "spec_multi never dispatched"

    import time as _t
    # steady-state per-dispatch wall (same args; donated cache rotates)
    g = eng.add_request(GenerationRequest(list(prompt),
                                          SamplingParams(max_len=6 * R * (gamma + 1))))
    while any(s.state.value in ("running_prefill", "waiting") for s in g.seqs):
        eng.step()
    times = []
    for _ in range(6):
        t0 = _t.perf_counter()
        eng.step()
        times.append((_t.perf_counter() - t0) * 1e3)
    print("per-dispatch wall ms:", [round(t, 1) for t in times], flush=True)

    lowered = captured["fn"].lower(*captured["args"])
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB", flush=True)
    open("/tmp/spec_opt.hlo", "w").write(txt)

    # map each copy-start/slice(-start)? of a big buffer to its computation
    comp = None
    in_entry = None
    counts = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*(?:->|\{)", line) \
            if ("{" in line and "=" not in line.split("{")[0]) else None
        if m:
            comp = m.group(2)
            in_entry = bool(m.group(1))
            continue
        if "copy-start" in line or "slice-start" in line or \
           ("= " in line and " slice(" in line) or " copy(" in line:
            shapes = re.findall(r"(?:u8|f32|bf16|s8)\[([\d,]+)\]", line)
            big = False
            for s in shapes:
                n = 1
                for d in s.split(","):
                    n *= int(d)
                if n >= 1 << 22:  # >=4M elements
                    big = True
            if big:
                op = line.strip().split(" = ")[0]
                kind = ("copy-start" if "copy-start" in line
                        else "slice-start" if "slice-start" in line
                        else "slice" if " slice(" in line else "copy")
                key = (comp or "?", kind)
                counts[key] = counts.get(key, 0) + 1
                if counts[key] <= 3:
                    print(f"[{comp}] {line.strip()[:240]}", flush=True)
    print("\nsummary (computation, kind) -> count:")
    for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
