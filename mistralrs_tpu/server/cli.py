"""CLI frontend.

Reference parity: mistralrs-server/src/main.rs — clap args (:41-142) +
`ModelSelected` subcommands (model_selected.rs). Subset for the TPU build:
plain (safetensors dir), gguf, with ISQ / paged-KV / scheduler knobs.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mistralrs-tpu-server")
    p.add_argument("--port", type=int, default=1234)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--model-id", default=None, help="display name for /v1/models")
    p.add_argument("--max-seqs", type=int, default=16)
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument("--page-size", type=int, default=16, help="KV page size (tokens)")
    p.add_argument("--kv-pages", type=int, default=None, help="override number of KV pages")
    p.add_argument("--kv-mem-fraction", type=float, default=0.9,
                   help="fraction of free HBM for KV pages (ref: 90%% default)")
    p.add_argument("--prefill-chunk", type=int, default=512)
    p.add_argument("--interactive", action="store_true", help="terminal chat instead of server")
    p.add_argument("--throughput", action="store_true",
                   help="per-step throughput logging (ref --throughput)")
    p.add_argument("--log", default=None, help="request/response JSONL log file")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of serving to this dir "
                        "(SURVEY §5: the TPU answer to the reference's tracing)")
    p.add_argument("--tp", type=int, default=None, help="tensor-parallel degree")
    p.add_argument("--dp", type=int, default=1, help="data-parallel degree")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel degree (ring-attention prefill)")

    sub = p.add_subparsers(dest="which", required=True)
    plain = sub.add_parser("plain", help="safetensors model directory")
    plain.add_argument("--model", required=True, help="local HF model directory")
    plain.add_argument("--isq", default=None, help="in-situ quantization (e.g. Q4K, Q8_0)")
    plain.add_argument("--topology", default=None, help="per-layer ISQ topology YAML")
    plain.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])

    gguf = sub.add_parser("gguf", help="GGUF quantized model")
    gguf.add_argument("--model", required=True, help="path to .gguf file(s)", nargs="+")
    gguf.add_argument("--tokenizer", default=None, help="HF dir for tokenizer (else GGUF-embedded)")

    toml = sub.add_parser("toml", help="TOML model selector (ref toml_selector.rs)")
    toml.add_argument("--file", required=True, help="selector .toml path")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp

    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.utils.debug import initialize_logging

    initialize_logging()
    pc = PipelineConfig(
        page_size=args.page_size,
        # None = auto-size from free device memory after the model loads
        # (ref main.rs:352-405 PagedAttention resolution matrix)
        num_pages=args.kv_pages,
        kv_mem_fraction=args.kv_mem_fraction,
        max_seqs=args.max_seqs,
        max_model_len=args.max_model_len,
        prefill_buckets=tuple(
            b for b in (16, 64, 256, 512, 1024, 2048) if b <= args.prefill_chunk
        ) or (args.prefill_chunk,),
    )
    mesh = None
    if args.tp or args.dp > 1 or args.sp > 1:
        from mistralrs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp)

    from mistralrs_tpu.api import Runner

    if args.which == "plain":
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        runner = Runner(
            args.model, dtype=dtype, isq=args.isq, topology=args.topology,
            pipeline_config=pc, mesh=mesh,
        )
        model_id = args.model_id or args.model
    elif args.which == "toml":
        from mistralrs_tpu.toml_selector import runner_from_toml

        runner = runner_from_toml(args.file, pc=pc, mesh=mesh)
        model_id = args.model_id or args.file
    else:
        from mistralrs_tpu.pipeline.gguf import load_gguf_model
        from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

        cfg, params, rope, tokenizer = load_gguf_model(args.model)
        if args.tokenizer:
            tokenizer = TokenizerWrapper.from_hf_dir(args.tokenizer)
        runner = Runner.from_parts(cfg, params, rope, tokenizer, pc=pc, mesh=mesh)
        model_id = args.model_id or args.model[0]

    eng = runner.handle.engine
    if args.throughput:
        eng.throughput_logging = True
    if args.log:
        eng.request_log_file = args.log

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile_dir:
        import jax

        prof = jax.profiler.trace(args.profile_dir)
    with prof:
        if args.interactive:
            from mistralrs_tpu.server.interactive import interactive_chat

            interactive_chat(runner)
        else:
            from mistralrs_tpu.server.openai import run_server

            run_server(runner, host=args.host, port=args.port, model_id=model_id)


if __name__ == "__main__":
    main()
