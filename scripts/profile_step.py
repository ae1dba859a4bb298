"""On-chip profiler trace of the single-stream decode step (r4).

The step_decompose fit leaves ~0.17 ms/layer (B=1) / ~0.55 (B=32) of
residual beyond raw kernel time, and the harness-level A/Bs can't see
inside the step. This traces a few multistep dispatches with
jax.profiler and parses the xplane in-process (tensorflow +
tensorboard_plugin_profile are in the image), printing per-op device
self-time aggregated by op name — the direct answer to "where do the
non-kernel milliseconds go".

Run: python scripts/profile_step.py [--batch32]
"""
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

TRACE_DIR = "/tmp/mistralrs_prof_r4"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench as driver_bench
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    batch = int(os.environ.get("MISTRALRS_PROFILE_BATCH",
                               "32" if "--batch32" in sys.argv else "1"))
    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    ds = int(os.environ.get("MISTRALRS_PROFILE_DS", "16"))
    pc = PipelineConfig(page_size=16, num_pages=64 + batch * 12,
                        max_seqs=max(2, batch), max_model_len=2048,
                        prefill_buckets=(64,), decode_steps=ds)
    eng = Engine(TextPipeline(cfg, params, make_rope(cfg, 2048), pc),
                 eos_token_ids=set(), prefix_cache=False)
    prompt = list(np.random.default_rng(1).integers(1, 30000, size=64))
    eng.generate(prompt, SamplingParams(max_len=8))  # compile
    # warm request set, then trace 2 dispatches' worth of decode
    from mistralrs_tpu.engine.engine import GenerationRequest

    groups = [eng.add_request(GenerationRequest(list(prompt),
                                                SamplingParams(max_len=4 * ds + 8)))
              for _ in range(batch)]
    while any(s.state.value in ("running_prefill", "waiting")
              for g in groups for s in g.seqs):
        eng.step()
    import time as _t

    os.makedirs(TRACE_DIR, exist_ok=True)
    t0 = _t.perf_counter()
    for _ in range(2):
        eng.step()
    wall_untraced = _t.perf_counter() - t0
    jax.profiler.start_trace(TRACE_DIR)
    t0 = _t.perf_counter()
    for _ in range(2):
        eng.step()
    wall = _t.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"wall: {wall*1e3:.1f} ms traced / {wall_untraced*1e3:.1f} ms "
          f"untraced for 2 dispatches ({2*ds} tokens x B={batch})",
          flush=True)
    while not all(g.all_done() for g in groups):
        eng.step()
    print("trace captured; parsing...", flush=True)

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("NO xplane files — backend may not support device tracing",
              flush=True)
        return
    latest = max(files, key=os.path.getmtime)
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(latest, "rb").read())
    per_op = collections.Counter()
    per_cat = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                per_op[name] += dur
                # crude category: fusion/pallas/gather/scatter/etc
                for cat in ("fusion", "dynamic-update-slice", "dynamic-slice",
                            "gather", "scatter", "copy", "custom-call",
                            "convert", "dot", "reduce", "broadcast",
                            "transpose", "concatenate", "select", "iota",
                            "while", "slice", "pad"):
                    if cat in name:
                        per_cat[cat] += dur
                        break
                else:
                    per_cat["other"] += dur
    total = sum(per_op.values())
    print(f"plane total device-time: {total/1e6:.2f} ms "
          f"(2 dispatches = 32 decode steps, B={batch})", flush=True)
    print("== by category ==", flush=True)
    for cat, ns in per_cat.most_common():
        print(f"  {cat:22s} {ns/1e6:8.2f} ms  {100*ns/max(total,1):5.1f}%",
              flush=True)
    print("== top 40 ops ==", flush=True)
    for name, ns in per_op.most_common(40):
        print(f"  {ns/1e6:8.2f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
