"""Device memory accounting + paged-KV pool sizing.

Reference parity: mistralrs-core/src/utils/memory_usage.rs (`MemoryUsage`:
sysinfo / cuda mem_get_info) and paged_attention/mod.rs
`calculate_cache_config` (:91-131): the KV pool is sized from a memory
amount, a utilization fraction of free memory, or a target context length;
block size defaults to 32 in the reference ({8,16,32} supported) — here the
page size is free but 16 aligns with the (8,128) tiling.
"""

from __future__ import annotations

import dataclasses


def device_memory_stats(device=None) -> tuple[int | None, int | None]:
    """(bytes_free, bytes_total) for the default device, or (None, None)
    when the backend doesn't report (CPU backend)."""
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None, None
    if not stats:
        return None, None
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    used = stats.get("bytes_in_use", 0)
    if limit is None:
        return None, None
    return limit - used, limit


@dataclasses.dataclass
class PagedCacheConfig:
    """Ref PagedAttentionConfig (paged_attention/mod.rs:29-56)."""

    mem_fraction: float | None = 0.9  # fraction of free device memory
    mem_bytes: int | None = None  # absolute budget
    context_len: int | None = None  # size for N total cached tokens instead
    page_size: int = 16


def calculate_num_pages(
    cfg: PagedCacheConfig,
    num_layers: int,
    num_kv_heads: int,
    head_dim: int,
    dtype_bytes: int = 2,
    max_seqs: int = 16,
    device=None,
) -> int:
    """Number of KV pages the pool should hold (ref calculate_cache_config).

    Priority: context_len > mem_bytes > mem_fraction of free memory.
    Falls back to 512 pages when the backend reports no memory stats."""
    page_bytes = 2 * num_layers * num_kv_heads * head_dim * cfg.page_size * dtype_bytes
    if cfg.context_len is not None:
        # enough pages for max_seqs sequences of context_len tokens
        per_seq = -(-cfg.context_len // cfg.page_size)
        return max(per_seq * max_seqs + 1, 2)
    budget = cfg.mem_bytes
    if budget is None:
        free, _total = device_memory_stats(device)
        if free is None:
            return 512
        budget = int(free * (cfg.mem_fraction or 0.9))
    return max(int(budget // page_bytes), 2)
