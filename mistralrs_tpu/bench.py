"""Benchmark harness: llama.cpp-comparable pp (prompt) / tg (generation)
throughput tables.

Reference parity: mistralrs-bench/src/main.rs (`run_bench` :47-130): builds
requests with fixed greedy sampling, measures Usage tokens/sec mean±std
across repetitions and concurrency levels, prints a table.

Usage:
    python -m mistralrs_tpu.bench plain --model <hf-dir> -p 512 -g 128 -r 3 -c 1
    python -m mistralrs_tpu.bench gguf --model <file.gguf> ...
"""

from __future__ import annotations

import argparse
import statistics
import time


def run_bench(engine, prompt_len: int, gen_len: int, repetitions: int,
              concurrency: int, vocab: int) -> dict:
    """One (pp or tg) measurement: returns tokens/sec stats dict."""
    import numpy as np

    from mistralrs_tpu.engine.engine import GenerationRequest
    from mistralrs_tpu.engine.sampler import SamplingParams

    rng = np.random.default_rng(0)
    pp_rates: list[float] = []
    tg_rates: list[float] = []
    for _ in range(repetitions):
        groups = []
        for _ in range(concurrency):
            prompt = rng.integers(1, max(2, vocab - 2), size=prompt_len).tolist()
            groups.append(engine.add_request(
                GenerationRequest(prompt, SamplingParams(max_len=max(gen_len, 1)))
            ))
        while engine.has_work:
            engine.step()
        for g in groups:
            u = g.usage()
            if prompt_len > 0 and u.avg_prompt_tok_per_sec:
                pp_rates.append(u.avg_prompt_tok_per_sec)
            if gen_len > 0 and u.avg_compl_tok_per_sec:
                tg_rates.append(u.avg_compl_tok_per_sec)
    def stats(rates):
        if not rates:
            return None
        return {
            "mean": statistics.fmean(rates),
            "std": statistics.pstdev(rates) if len(rates) > 1 else 0.0,
        }
    return {"pp": stats(pp_rates), "tg": stats(tg_rates)}


def print_table(rows: list[dict]) -> None:
    hdr = f"| {'test':<10} | {'concurrency':>11} | {'t/s (mean)':>12} | {'t/s (std)':>10} |"
    sep = "|" + "-" * (len(hdr) - 2) + "|"
    print(hdr)
    print(sep)
    for r in rows:
        print(f"| {r['test']:<10} | {r['concurrency']:>11} | "
              f"{r['mean']:>12.2f} | {r['std']:>10.2f} |")


def main(argv=None):
    p = argparse.ArgumentParser("mistralrs-tpu-bench")
    sub = p.add_subparsers(dest="which", required=True)
    for name in ("plain", "gguf"):
        s = sub.add_parser(name)
        s.add_argument("--model", required=True, nargs="+" if name == "gguf" else None)
        if name == "plain":
            s.add_argument("--isq", default=None)
    p.add_argument("-p", "--prompt-len", type=int, nargs="*", default=[512])
    p.add_argument("-g", "--gen-len", type=int, nargs="*", default=[128])
    p.add_argument("-r", "--repetitions", type=int, default=3)
    p.add_argument("-c", "--concurrency", type=int, nargs="*", default=[1])
    p.add_argument("--max-seqs", type=int, default=16)
    p.add_argument("--max-model-len", type=int, default=4096)
    args = p.parse_args(argv)

    from mistralrs_tpu.pipeline.text import PipelineConfig

    pc = PipelineConfig(max_seqs=args.max_seqs, max_model_len=args.max_model_len)
    if args.which == "plain":
        from mistralrs_tpu.api import Runner

        runner = Runner(args.model, pipeline_config=pc, isq=args.isq)
    else:
        from mistralrs_tpu.api import Runner
        from mistralrs_tpu.pipeline.gguf import load_gguf_model

        cfg, params, rope, tokenizer = load_gguf_model(args.model)
        runner = Runner.from_parts(cfg, params, rope, tokenizer, pc=pc)
    engine = runner.handle.engine
    runner.handle.shutdown()  # drive the engine synchronously for timing
    vocab = engine.pipeline.cfg.vocab_size

    rows = []
    for c in args.concurrency:
        for pl in args.prompt_len:
            if pl:
                r = run_bench(engine, pl, 1, args.repetitions, c, vocab)
                if r["pp"]:
                    rows.append({"test": f"pp {pl}", "concurrency": c, **r["pp"]})
        for gl in args.gen_len:
            if gl:
                r = run_bench(engine, 16, gl, args.repetitions, c, vocab)
                if r["tg"]:
                    rows.append({"test": f"tg {gl}", "concurrency": c, **r["tg"]})
    print_table(rows)


if __name__ == "__main__":
    main()
