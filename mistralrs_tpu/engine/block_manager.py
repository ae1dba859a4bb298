"""Physical KV page allocator with refcounting and copy-on-write.

Reference parity: mistralrs-core/src/paged_attention/block_engine.rs —
`BlockEngine` (:11-378): refcounted `PhysicalTokenBlock`s, allocation gate
(`AllocStatus`), `free_sequence`, `append_token_slot_to_seq` with COW on a
shared last block (:300-330). The CPU-swap allocator exists in the reference
but swapping is disabled (scheduler.rs:284-290, preempt-by-recompute only);
we likewise implement preempt-by-recompute and skip host swap.

Page 0 is reserved as the garbage page for padding writes
(see ops/paged_attention.py), so the allocatable pool is pages 1..P-1.
"""

from __future__ import annotations

import enum

from mistralrs_tpu.engine.sequence import Sequence


class AllocStatus(enum.Enum):
    OK = "ok"
    LATER = "later"  # not enough pages now, retry later
    IMPOSSIBLE = "impossible"  # larger than the whole pool


def make_block_manager(num_pages: int, page_size: int, watermark: float = 0.01):
    """Native (C++) allocator when available, Python fallback otherwise
    (set MISTRALRS_NATIVE=0 to force Python)."""
    from mistralrs_tpu.native import runtime_lib

    lib = runtime_lib()
    if lib is not None:
        return NativeBlockManager(lib, num_pages, page_size, watermark)
    return BlockManager(num_pages, page_size, watermark)


class BlockManager:
    def __init__(self, num_pages: int, page_size: int, watermark: float = 0.01):
        assert num_pages >= 2
        self.num_pages = num_pages
        self.page_size = page_size
        self.free_pages: list[int] = list(range(num_pages - 1, 0, -1))  # pop() -> low ids first
        self.refcount: dict[int, int] = {}
        self.watermark_pages = max(1, int(watermark * num_pages))

    # ------------------------------------------------------------- queries
    @property
    def num_free(self) -> int:
        return len(self.free_pages)

    def pages_needed(self, num_tokens: int) -> int:
        return (num_tokens + self.page_size - 1) // self.page_size

    def can_allocate(self, seq: Sequence) -> AllocStatus:
        total = self.pages_needed(len(seq.tokens))
        if total > self.num_pages - 1:
            return AllocStatus.IMPOSSIBLE
        # pages already attached (prefix-cache hit) don't need allocating
        need = total - len(seq.block_table)
        if self.num_free - need >= self.watermark_pages:
            return AllocStatus.OK
        return AllocStatus.LATER

    def can_append_token(self, seq: Sequence, n: int = 1) -> bool:
        """True if an n-token append is satisfiable (n>1: speculative
        lookahead, reserving the whole draft span before the step)."""
        end_pages = self.pages_needed(seq.kv_len + n)
        need = max(0, end_pages - len(seq.block_table))
        return self.num_free >= need

    # ------------------------------------------------------------- mutation
    def _alloc_page(self) -> int:
        page = self.free_pages.pop()
        self.refcount[page] = 1
        return page

    def allocate(self, seq: Sequence) -> None:
        """Allocate pages to cover seq's current tokens (prefill admission).

        Extends past any prefix-cache pages already attached to the table."""
        need = self.pages_needed(len(seq.tokens)) - len(seq.block_table)
        assert len(self.free_pages) >= need
        seq.block_table.extend(self._alloc_page() for _ in range(need))

    def append_slot(self, seq: Sequence, n: int = 1) -> tuple[int, int] | None:
        """Ensure capacity for n more tokens at kv positions
        [seq.kv_len, seq.kv_len + n).

        Returns (src_page, dst_page) if a COW copy is required (first write
        lands in a shared page), else None. Pages past the first write are
        always freshly allocated, never shared.
        (Ref append_token_slot_to_seq :300-330.)
        """
        kv = seq.kv_len
        cow: tuple[int, int] | None = None
        first_idx = kv // self.page_size
        if kv % self.page_size != 0 and first_idx < len(seq.block_table):
            page = seq.block_table[first_idx]
            if self.refcount.get(page, 1) > 1:
                # copy-on-write: replace the shared page with a fresh copy
                new = self._alloc_page()
                self.refcount[page] -= 1
                seq.block_table[first_idx] = new
                cow = (page, new)
        end_pages = self.pages_needed(kv + n)
        while len(seq.block_table) < end_pages:
            seq.block_table.append(self._alloc_page())
        return cow

    def fork(self, parent: Sequence, child: Sequence) -> None:
        """Share parent's pages with child (prefix cache / beam fork);
        window-released placeholder entries are copied but not referenced."""
        child.block_table = list(parent.block_table)
        child.released_pages = parent.released_pages
        for p in child.block_table[parent.released_pages:]:
            self.refcount[p] = self.refcount.get(p, 0) + 1

    def share_prefix(self, seq: Sequence, pages: list[int]) -> None:
        """Attach already-populated prefix pages (prefix cache hit)."""
        seq.block_table = list(pages)
        for p in pages:
            self.refcount[p] = self.refcount.get(p, 0) + 1

    def free_sequence(self, seq: Sequence) -> None:
        self.unref_pages(seq.block_table[seq.released_pages:])
        seq.block_table = []
        seq.released_pages = 0

    def release_prefix(self, seq: Sequence, n: int) -> None:
        """Early-release whole pages strictly behind a sliding window:
        frees block_table[released, n) while keeping the entries as
        positional placeholders (never gathered — the decode paths slice
        tables from the window base). The paged equivalent of the
        reference's sliding-window KV truncation (cache_manager.rs:101-154)."""
        n = min(n, len(seq.block_table))
        self.unref_pages(seq.block_table[seq.released_pages : n])
        seq.released_pages = max(seq.released_pages, n)

    def ref_pages(self, pages: list[int]) -> None:
        """Take an ownership reference on pages (prefix cache retention)."""
        for p in pages:
            self.refcount[p] = self.refcount.get(p, 0) + 1

    def unref_pages(self, pages: list[int]) -> None:
        for p in pages:
            rc = self.refcount.get(p, 0) - 1
            if rc <= 0:
                self.refcount.pop(p, None)
                self.free_pages.append(p)
            else:
                self.refcount[p] = rc


class NativeBlockManager:
    """ctypes facade over the C++ allocator (native/runtime.cpp) with the
    same surface and semantics as BlockManager. Sequences' `block_table`
    lists are mirrored from the native side after every mutation (the
    pipeline builds device arrays from them)."""

    def __init__(self, lib, num_pages: int, page_size: int, watermark: float = 0.01):
        import ctypes

        assert num_pages >= 2
        self._lib = lib
        self._h = lib.bm_new(num_pages, page_size, watermark)
        self._i32 = ctypes.c_int32
        self.num_pages = num_pages
        self.page_size = page_size
        self.watermark_pages = max(1, int(watermark * num_pages))

    def __del__(self):
        try:
            self._lib.bm_delete(self._h)
        except Exception:
            pass

    # ------------------------------------------------------------- queries
    @property
    def num_free(self) -> int:
        return int(self._lib.bm_num_free(self._h))

    def pages_needed(self, num_tokens: int) -> int:
        return (num_tokens + self.page_size - 1) // self.page_size

    def can_allocate(self, seq: Sequence) -> AllocStatus:
        r = self._lib.bm_can_allocate(self._h, seq.id, len(seq.tokens))
        return (AllocStatus.OK, AllocStatus.LATER, AllocStatus.IMPOSSIBLE)[r]

    def can_append_token(self, seq: Sequence, n: int = 1) -> bool:
        return bool(self._lib.bm_can_append(self._h, seq.id, seq.kv_len, n))

    # ------------------------------------------------------------- helpers
    def _sync_table(self, seq: Sequence) -> None:
        import ctypes

        n = self._lib.bm_table_len(self._h, seq.id)
        buf = (self._i32 * max(n, 1))()
        if n:
            self._lib.bm_get_table(self._h, seq.id, buf)
        seq.block_table = list(buf[:n])

    @staticmethod
    def _arr(pages):
        import ctypes

        return (ctypes.c_int32 * len(pages))(*pages)

    # ------------------------------------------------------------- mutation
    def allocate(self, seq: Sequence) -> None:
        r = self._lib.bm_allocate(self._h, seq.id, len(seq.tokens))
        assert r >= 0, "allocator out of pages (scheduler admitted too much)"
        self._sync_table(seq)

    def append_slot(self, seq: Sequence, n: int = 1):
        packed = self._lib.bm_append_slots(self._h, seq.id, seq.kv_len, n)
        assert packed != -2, "allocator out of pages during append"
        self._sync_table(seq)
        if packed == -1:
            return None
        return (int(packed >> 32), int(packed & 0xFFFFFFFF))

    def fork(self, parent: Sequence, child: Sequence) -> None:
        # window-released placeholder entries must never be referenced (their
        # pages may already be back in the free list)
        self._lib.bm_share_prefix_released(
            self._h, child.id, self._arr(parent.block_table),
            len(parent.block_table), parent.released_pages)
        child.released_pages = parent.released_pages
        self._sync_table(child)

    def share_prefix(self, seq: Sequence, pages: list[int]) -> None:
        self._lib.bm_share_prefix(self._h, seq.id, self._arr(pages), len(pages))
        self._sync_table(seq)

    def free_sequence(self, seq: Sequence) -> None:
        self._lib.bm_free_seq(self._h, seq.id)
        seq.block_table = []
        seq.released_pages = 0

    def release_prefix(self, seq: Sequence, n: int) -> None:
        self._lib.bm_release_prefix(self._h, seq.id, n)
        seq.released_pages = max(seq.released_pages, min(n, len(seq.block_table)))

    def ref_pages(self, pages: list[int]) -> None:
        if pages:
            self._lib.bm_ref_pages(self._h, self._arr(pages), len(pages))

    def unref_pages(self, pages: list[int]) -> None:
        if pages:
            self._lib.bm_unref_pages(self._h, self._arr(pages), len(pages))
