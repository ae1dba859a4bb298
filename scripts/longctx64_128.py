"""64k int8 (new blockwise int8 route) + first 128k decode points.

r5 longctx_ab could not compile 64k int8 (1.1 GB one-shot dequant
transient); ops/paged_attention.blockwise_prefill_continuation now takes
(payload, scale) int8 pools and dequantizes per kv_block, so the long-span
decode route exists for quantized KV. This measures it and pushes to 128k
(the models claim 128k context; 64k bf16 was the furthest measured point).

Run: python scripts/longctx64_128.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MISTRALRS_CACHE_DIR",
                                     "/tmp/mistralrs_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import longctx_ab

    arms = [
        (65536, dict(kv_quant=True, b=8), "64k int8 B=8 (blockwise, NEW)"),
        (131072, dict(kv_quant=True, b=4), "128k int8 B=4 (first 128k)"),
        (131072, dict(b=2), "128k bf16 B=2"),
    ]
    for ctx, kw, name in arms:
        try:
            r = longctx_ab._rate(ctx, **kw)
            print(f"{name}: {r:.1f} tok/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
