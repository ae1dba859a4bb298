"""On-chip trace of the batched prefill step (pp roofline decomposition).

bench.py's pp512 measures ~50% MFU-equivalent; this traces one batched
512-token x16 prefill forward and prints per-op device time so the gap
to the MXU roofline is attributable (dequant share, flash attention,
norms, dead padding).

Run: python scripts/profile_prefill.py
"""
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

TRACE_DIR = "/tmp/mistralrs_prof_pp"


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

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16)
    pc = PipelineConfig(page_size=16, num_pages=16 * 40, max_seqs=16,
                        max_model_len=640, prefill_buckets=(512,),
                        decode_steps=16)
    eng = Engine(TextPipeline(cfg, params, make_rope(cfg, 640), pc),
                 eos_token_ids=set(), prefix_cache=False)
    prompt = list(np.random.default_rng(2).integers(1, 30000, size=512))
    # compile the batched 512-bucket prefill + decode variants
    warm = [eng.add_request(GenerationRequest(list(prompt),
                                              SamplingParams(max_len=2)))
            for _ in range(16)]
    while not all(g.all_done() for g in warm):
        eng.step()
    groups = [eng.add_request(GenerationRequest(list(prompt),
                                                SamplingParams(max_len=2)))
              for _ in range(16)]
    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    eng.step()  # ONE batched prefill forward (16 x 512)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    while not all(g.all_done() for g in groups):
        eng.step()
    print(f"wall {wall*1e3:.0f} ms for 16x512 prefill = "
          f"{16*512/wall:.0f} tok/s", flush=True)
    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane"); return
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(max(files, key=os.path.getmtime), "rb").read())
    per_op = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    for name, ns in per_op.most_common(25):
        print(f"  {ns/1e6:8.2f} ms  {name[:105]}", flush=True)


if __name__ == "__main__":
    main()
