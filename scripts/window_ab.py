"""Long-context windowed-decode gather A/B on hardware (VERDICT r2 #8).

For sliding-window models (mistral w=4096, pattern "all"),
TextPipeline._window_base_pages slices decode block tables from the window
base so the KV gather streams ~window tokens instead of the full live span.
This measures the actual win at a 16k context: pipeline-level decode step
time with the window slicing active (sliding_window=4096) vs the same
shapes treated as full-attention (sliding_window=None → gathers all 16k).

Sequences are CRAFTED (block tables allocated, kv_len=16k) rather than
prefilled — decode step timing does not depend on KV contents, and a real
16k prefill would blow the 580 s queue cap on this host.

Timing per the axon rules (PERF.md): wall-time over N engine-free
run_decode calls with one np.asarray fetch each (the decode fetch is the
real serving pattern); median of reps.

Run: python scripts/window_ab.py  (expects the TPU tunnel up)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

LAYERS = 8
CTX = 16384
B = 8
STEPS = 12
REPS = 3


def _mk_pipe(window):
    import dataclasses

    import jax.numpy as jnp

    import bench as driver_bench
    from mistralrs_tpu.models.loader import make_rope
    from mistralrs_tpu.pipeline.text import PipelineConfig, TextPipeline

    cfg, params = driver_bench._build_7b_q4km(jnp.bfloat16, num_layers=LAYERS)
    cfg = dataclasses.replace(
        cfg,
        max_position_embeddings=CTX + 256,
        sliding_window=window,
        sliding_window_pattern="all" if window else "none",
    )
    ps = 16
    pages_per_seq = (CTX + 256) // ps
    pc = PipelineConfig(
        page_size=ps, num_pages=B * pages_per_seq + 8, max_seqs=B,
        max_model_len=CTX + 256, prefill_buckets=(64,), decode_steps=1,
    )
    return TextPipeline(cfg, params, make_rope(cfg, CTX + 256), pc)


def _craft_seqs(pipe):
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.engine.sequence import Sequence, SequenceState

    rng = np.random.default_rng(0)
    ps = pipe.pc.page_size
    pages_per_seq = (CTX + 256) // ps
    seqs = []
    for i in range(B):
        toks = rng.integers(1, 30000, size=CTX).tolist()
        s = Sequence(toks, SamplingParams(max_len=STEPS + 1),
                     max_model_len=pipe.pc.max_model_len)
        s.block_table = list(range(1 + i * pages_per_seq,
                                   1 + (i + 1) * pages_per_seq))
        s.kv_len = CTX
        s.prefill_done_tokens = CTX
        s.state = SequenceState.RUNNING_COMPLETION
        seqs.append(s)
    return seqs


def _rate(window) -> float:
    pipe = _mk_pipe(window)
    seqs = _craft_seqs(pipe)
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
        for s in seqs:  # rewind so every rep times the same spans
            del s.tokens[-STEPS:]
            s.kv_len -= STEPS
    step = sorted(times)[len(times) // 2]
    return B / step  # aggregate decode tok/s


def main():
    full = _rate(None)
    print(f"decode @16k ctx, full-span gather : {full:7.1f} tok/s (B={B})",
          flush=True)
    win = _rate(4096)
    print(f"decode @16k ctx, windowed (w=4096): {win:7.1f} tok/s (B={B})  "
          f"[{win / full:.2f}x]", flush=True)


if __name__ == "__main__":
    main()
