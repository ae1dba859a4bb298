"""CLI frontend.

Reference parity: mistralrs-server/src/main.rs — clap args (:41-142,
--chat-template :77, --token-source :82) + the full `ModelSelected`
subcommand set (model_selected.rs:21-312): plain / lora / x-lora / gguf /
lora-gguf / x-lora-gguf / ggml / lora-ggml / x-lora-ggml / vision-plain /
toml, with ISQ / paged-KV / scheduler knobs.
"""

from __future__ import annotations

import argparse
import os


def _add_adapter_args(sp, xlora: bool):
    """Shared adapter flags (ref Lora/XLora variant fields)."""
    if xlora:
        sp.add_argument("--xlora-model-id", required=True,
                        help="X-LoRA dir (xlora_config.json + classifier + adapters)")
        sp.add_argument("--tgt-non-granular-index", type=int, default=None,
                        help="completion-token index to freeze scalings at "
                             "(caps running sequences at 1, ref model_selected.rs:72)")
    else:
        sp.add_argument("--adapters-model-id", required=True, nargs="+",
                        help="PEFT adapter dir(s)")
    sp.add_argument("--order", default=None, help="adapter ordering JSON file")


def _add_gguf_args(sp):
    sp.add_argument("--model", required=True, nargs="+",
                    help="path to .gguf file(s) (multi-file checkpoints)")
    sp.add_argument("--tokenizer", default=None,
                    help="HF dir for tokenizer (else GGUF-embedded)")


def _add_ggml_args(sp):
    sp.add_argument("--model", required=True, help="path to .ggml/.bin file")
    sp.add_argument("--tokenizer", required=True,
                    help="HF dir for the tokenizer (legacy GGML has none "
                         "embedded, ref GGMLLoader tok_model_id)")
    sp.add_argument("--gqa", type=int, default=1,
                    help="n_head/n_kv_head ratio (legacy header lacks kv "
                         "heads, ref utils/model_config.rs:19)")


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
    p.add_argument("--kv-mem-mb", type=int, default=None,
                   help="absolute KV pool budget in MB (ref --pa-gpu-mem)")
    p.add_argument("--kv-ctxt-len", type=int, default=None,
                   help="size the KV pool for this many total cached tokens "
                        "per running sequence (ref --pa-ctxt-len)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (per-slot scales): ~2x pages in the "
                        "same HBM, ~half the KV stream at long context")
    p.add_argument("--prompt-lookup-gamma", type=int, default=None,
                   help="enable draftless n-gram speculative decoding with "
                        "this many proposed tokens per step")
    p.add_argument("--compilation-cache-dir",
                   default=os.environ.get("MISTRALRS_COMPILE_CACHE"),
                   help="persist XLA compilations across restarts (first "
                        "TPU compile is 20-40s; reboots become instant)")
    p.add_argument("--prefill-chunk", type=int, default=512)
    p.add_argument("--truncate-sequence", action="store_true",
                   help="truncate over-length prompts to fit max-model-len "
                        "instead of refusing them (ref main.rs:60)")
    p.add_argument("--prefix-cache-n", type=int, default=16,
                   help="device prefix-cache budget, in max-length sequences "
                        "(0 disables; ref main.rs:94 --prefix-cache-n)")
    p.add_argument("--chat-template", default=None,
                   help="override/fallback chat template: a bundled name "
                        "(chatml, llama2, llama3, mistral, phi3, vicuna, "
                        "gemma, default), a .json with a chat_template key, "
                        "or a raw .jinja file (ref main.rs:77 + "
                        "chat_templates/*.json)")
    p.add_argument("--token-source", default="cache",
                   help="hub auth source: literal:<t> | env:<VAR> | "
                        "path:<file> | cache | none (ref main.rs:82)")
    p.add_argument("--interactive", action="store_true", help="terminal chat instead of server")
    p.add_argument("--vi", action="store_true",
                   help="vision interactive mode (ref main.rs --vi): "
                        "\\image <path> attaches images in the REPL")
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

    def plain_like(name, help_):
        sp = sub.add_parser(name, help=help_)
        sp.add_argument("--model", required=True, help="local HF model directory")
        sp.add_argument("--isq", default=None, help="in-situ quantization (e.g. Q4K, Q8_0)")
        sp.add_argument("--topology", default=None, help="per-layer ISQ topology YAML")
        sp.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
        return sp

    plain_like("plain", "safetensors model directory")
    _add_adapter_args(plain_like("lora", "plain model + LoRA adapters"), xlora=False)
    _add_adapter_args(plain_like("x-lora", "plain model + X-LoRA classifier"), xlora=True)

    _add_gguf_args(sub.add_parser("gguf", help="GGUF quantized model"))
    lg = sub.add_parser("lora-gguf", help="GGUF model + LoRA adapters")
    _add_gguf_args(lg)
    _add_adapter_args(lg, xlora=False)
    xg = sub.add_parser("x-lora-gguf", help="GGUF model + X-LoRA")
    _add_gguf_args(xg)
    _add_adapter_args(xg, xlora=True)

    _add_ggml_args(sub.add_parser("ggml", help="legacy GGML quantized model"))
    lm = sub.add_parser("lora-ggml", help="GGML model + LoRA adapters")
    _add_ggml_args(lm)
    _add_adapter_args(lm, xlora=False)
    xm = sub.add_parser("x-lora-ggml", help="GGML model + X-LoRA")
    _add_ggml_args(xm)
    _add_adapter_args(xm, xlora=True)

    vp = sub.add_parser("vision-plain", help="vision model (ref VisionPlain)")
    vp.add_argument("--model", required=True, help="local HF model directory")
    vp.add_argument("--arch", required=True,
                    choices=["llava", "llava_next", "idefics2", "phi3v"])
    vp.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])

    toml = sub.add_parser("toml", help="TOML model selector (ref toml_selector.rs)")
    toml.add_argument("--file", required=True, help="selector .toml path")
    return p


def runner_from_args(args, pc, mesh):
    """ModelSelected dispatch -> Runner (ref main.rs loader selection)."""
    import jax.numpy as jnp

    from mistralrs_tpu.api import Runner

    which = args.which
    eng_kw = dict(truncate_sequence=args.truncate_sequence)
    if args.prefix_cache_n <= 0:
        eng_kw["prefix_cache"] = False
    else:
        # ref --prefix-cache-n counts held caches; translate to a page
        # budget of n max-length sequences
        eng_kw["prefix_cache_pages"] = (
            args.prefix_cache_n * -(-args.max_model_len // args.page_size))
    adapters = getattr(args, "adapters_model_id", None)
    ordering = getattr(args, "order", None)
    xlora_path = getattr(args, "xlora_model_id", None)
    if xlora_path is not None:
        # the X-LoRA model dir bundles its adapters (ref xlora loading:
        # the ordering file names adapters inside the repo)
        from mistralrs_tpu.lora import discover_adapters

        import json as _json
        import os as _os

        adapters = discover_adapters(xlora_path)
        if not adapters:
            raise SystemExit(
                f"no adapters found under {xlora_path!r}: expected "
                "<dir>/adapters/<name>/adapter_config.json or direct "
                "subdirs with adapter_config.json (the classifier needs "
                "its trained adapter count)"
            )
        if len(adapters) > 1 and ordering is None:
            # classifier scalings map to adapters BY POSITION; a directory
            # listing is not an order (ref model_selected.rs XLora makes the
            # ordering file mandatory)
            xcfg = _os.path.join(xlora_path, "xlora_config.json")
            has_cfg_order = False
            if _os.path.isfile(xcfg):
                with open(xcfg) as f:
                    has_cfg_order = bool(_json.load(f).get("adapters"))
            if not has_cfg_order:
                raise SystemExit(
                    f"{xlora_path!r} holds {len(adapters)} adapters but "
                    "neither xlora_config.json's 'adapters' mapping nor "
                    "--order fixes their classifier order; pass --order "
                    "with the training-order adapter list"
                )

    if which in ("plain", "lora", "x-lora"):
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        runner = Runner(
            args.model, dtype=dtype, isq=args.isq, topology=args.topology,
            pipeline_config=pc, mesh=mesh, token_source=args.token_source,
            adapters=adapters, ordering=ordering, xlora_path=xlora_path,
            prompt_lookup_gamma=args.prompt_lookup_gamma, **eng_kw,
        )
        return runner, args.model
    if which in ("gguf", "lora-gguf", "x-lora-gguf"):
        from mistralrs_tpu.pipeline.gguf import load_gguf_model
        from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

        cfg, params, rope, tokenizer = load_gguf_model(args.model)
        if args.tokenizer:
            tokenizer = TokenizerWrapper.from_hf_dir(args.tokenizer)
        runner = Runner.from_parts(
            cfg, params, rope, tokenizer, pc=pc, mesh=mesh,
            adapters=adapters, ordering=ordering, xlora_path=xlora_path,
            prompt_lookup_gamma=args.prompt_lookup_gamma, **eng_kw,
        )
        return runner, args.model[0]
    if which in ("ggml", "lora-ggml", "x-lora-ggml"):
        from mistralrs_tpu.gguf.ggml_reader import load_ggml_model
        from mistralrs_tpu.utils.tokenizer import TokenizerWrapper

        cfg, params, rope = load_ggml_model(args.model, gqa=args.gqa)
        tokenizer = TokenizerWrapper.from_hf_dir(args.tokenizer)
        runner = Runner.from_parts(
            cfg, params, rope, tokenizer, pc=pc, mesh=mesh,
            adapters=adapters, ordering=ordering, xlora_path=xlora_path,
            prompt_lookup_gamma=args.prompt_lookup_gamma, **eng_kw,
        )
        return runner, args.model
    if which == "vision-plain":
        from mistralrs_tpu.api import VisionRunner

        if args.prompt_lookup_gamma:
            raise SystemExit("--prompt-lookup-gamma is not supported for "
                             "vision models yet")
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
        runner = VisionRunner(args.model, args.arch, dtype=dtype,
                              pipeline_config=pc, mesh=mesh, **eng_kw)
        return runner, args.model
    # toml
    from mistralrs_tpu.toml_selector import runner_from_toml

    return (runner_from_toml(args.file, pc=pc, mesh=mesh,
                             prompt_lookup_gamma=args.prompt_lookup_gamma,
                             **eng_kw),
            args.file)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from mistralrs_tpu.pipeline.text import PipelineConfig
    from mistralrs_tpu.utils.debug import initialize_logging

    initialize_logging()
    if args.compilation_cache_dir:
        # persistent XLA compile cache: serve-time step functions reload in
        # ms instead of the 20-40s first-compile on engine reboot/restart
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # tgt_non_granular_index makes the max running sequences 1
    # (ref model_selected.rs:72 doc)
    if getattr(args, "tgt_non_granular_index", None) is not None:
        args.max_seqs = 1
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
        kv_quant=args.kv_quant,
        kv_mem_bytes=args.kv_mem_mb * (1 << 20) if args.kv_mem_mb else None,
        kv_ctxt_len=args.kv_ctxt_len,
    )
    mesh = None
    if args.tp or args.dp > 1 or args.sp > 1:
        from mistralrs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp)

    runner, default_id = runner_from_args(args, pc, mesh)
    model_id = args.model_id or default_id

    if args.chat_template:
        from mistralrs_tpu.chat_templates import resolve_chat_template

        runner.tokenizer.chat_template = resolve_chat_template(args.chat_template)

    # CLI override of the checkpoint's non-granular index (read per-step,
    # so a post-construction xcfg update is safe)
    tgt = getattr(args, "tgt_non_granular_index", None)
    if tgt is not None:
        pipe = runner.handle.engine.pipeline
        if hasattr(pipe, "xcfg"):
            pipe.xcfg.tgt_non_granular_index = tgt

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
        if args.vi:
            from mistralrs_tpu.server.interactive import vision_interactive_chat

            vision_interactive_chat(runner)
        elif args.interactive:
            from mistralrs_tpu.server.interactive import interactive_chat

            interactive_chat(runner)
        else:
            from mistralrs_tpu.server.openai import run_server

            run_server(runner, host=args.host, port=args.port, model_id=model_id)


if __name__ == "__main__":
    main()
