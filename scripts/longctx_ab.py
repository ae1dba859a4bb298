"""Long-context decode measurement: 16k and 32k spans (VERDICT r3 #5).

Arms per span: full-attention bf16-KV (gather+SDPA — today's default),
full-attention int8-KV (halved KV stream vs dequant VPU cost — find the
crossover), windowed bf16 (w=4096, mistral-style), and the Pallas
block-table decode kernel (MISTRALRS_PAGED_DECODE=1 route) at the full
span. 8-layer 7B-per-layer model, crafted sequences (no 32k prefill —
decode step time does not depend on KV contents), B=8.

Timing per the axon rules (PERF.md): wall time over STEPS run_decode calls
with one fetch each; median of REPS.

Run: python scripts/longctx_ab.py  (expects the TPU tunnel up)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

LAYERS = 8
B = 8
STEPS = 12
REPS = 3


def _mk_pipe(ctx, window, kv_quant):
    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16, num_layers=LAYERS)
    cfg = dataclasses.replace(
        cfg,
        max_position_embeddings=ctx + 256,
        sliding_window=window,
        sliding_window_pattern="all" if window else "none",
    )
    ps = 16
    pages_per_seq = (ctx + 256) // ps
    pc = PipelineConfig(
        page_size=ps, num_pages=B * pages_per_seq + 8, max_seqs=B,
        max_model_len=ctx + 256, prefill_buckets=(64,), decode_steps=1,
        kv_quant=kv_quant,
    )
    return TextPipeline(cfg, params, make_rope(cfg, ctx + 256), pc)


def _craft_seqs(pipe, ctx):
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.engine.sequence import Sequence, SequenceState

    rng = np.random.default_rng(0)
    ps = pipe.pc.page_size
    pages_per_seq = (ctx + 256) // ps
    seqs = []
    for i in range(B):
        toks = rng.integers(1, 30000, size=ctx).tolist()
        s = Sequence(toks, SamplingParams(max_len=STEPS + 1),
                     max_model_len=pipe.pc.max_model_len)
        s.block_table = list(range(1 + i * pages_per_seq,
                                   1 + (i + 1) * pages_per_seq))
        s.kv_len = ctx
        s.prefill_done_tokens = ctx
        s.state = SequenceState.RUNNING_COMPLETION
        seqs.append(s)
    return seqs


def _rate(ctx, window=None, kv_quant=False, b=None) -> float:
    global B
    if b is not None:
        B = b
    pipe = _mk_pipe(ctx, window, kv_quant)
    seqs = _craft_seqs(pipe, ctx)
    times = []
    for rep in range(REPS + 1):  # first rep = compile warmup
        t0 = time.perf_counter()
        for _ in range(STEPS):
            pack = pipe.run_decode(seqs, greedy=True, mode="greedy")
            np.asarray(pack)
            for s in seqs:
                s.tokens.append(3)
                s.kv_len += 1
        dt = time.perf_counter() - t0
        if rep:
            times.append(dt / STEPS)
        for s in seqs:
            del s.tokens[-STEPS:]
            s.kv_len -= STEPS
    del pipe  # free the pool before the next arm (32k bf16 = ~2.2 GB at 8L)
    step = sorted(times)[len(times) // 2]
    return B / step


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # r5: paired windows — every arm runs in TWO interleaved passes and
    # reports per-pass numbers, so window-to-window drift (the r4 16k A/B
    # landed inside it) is visible instead of silently folded in. 32k bf16
    # now compiles via the split KV pool (auto gate, pipeline/text.py);
    # 65536 gives the first >=64k point on the 128k claim (bf16 at B=4 for
    # HBM, int8 at B=8).
    spans = [
        (16384, [("full bf16-KV ", dict()),
                 ("full int8-KV ", dict(kv_quant=True)),
                 ("win4096 bf16 ", dict(window=4096))]),
        (32768, [("full bf16-KV ", dict()),
                 ("full int8-KV ", dict(kv_quant=True)),
                 ("win4096 bf16 ", dict(window=4096))]),
        (65536, [("full bf16 B=4", dict(b=4)),
                 ("full int8 B=8", dict(kv_quant=True, b=8))]),
    ]
    for ctx, arms in spans:
        for pazz in (1, 2):
            for name, kw in arms:
                try:
                    r = _rate(ctx, **kw)
                    print(f"ctx={ctx:6d} {name} pass{pazz}: {r:7.1f} tok/s",
                          flush=True)
                except Exception as e:
                    print(f"ctx={ctx:6d} {name} pass{pazz}: "
                          f"FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
