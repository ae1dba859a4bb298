// Native paged-KV block allocator.
//
// The TPU-native equivalent of the reference's Rust block engine
// (mistralrs-core/src/paged_attention/block_engine.rs): refcounted physical
// pages, free-list allocation, copy-on-write on shared pages, prefix-page
// sharing. The engine scheduler calls into this on every step; on a slow
// single-core host the allocator bookkeeping must stay out of Python.
//
// Page 0 is reserved as the garbage page (padding writes), so the
// allocatable pool is pages [1, num_pages).

#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

namespace {

struct SeqState {
  std::vector<int32_t> table;
  // pages [0, released) were handed back early (sliding-window release);
  // their table entries stay as positional placeholders and must not be
  // freed again when the sequence ends
  int32_t released = 0;
};

struct BlockManager {
  int32_t num_pages;
  int32_t page_size;
  int32_t watermark_pages;
  std::vector<int32_t> free_pages;  // stack; back() is next to allocate
  std::vector<int32_t> refcount;    // per page
  std::map<int64_t, SeqState> seqs;

  explicit BlockManager(int32_t pages, int32_t page, double watermark)
      : num_pages(pages), page_size(page) {
    watermark_pages = static_cast<int32_t>(watermark * pages);
    if (watermark_pages < 1) watermark_pages = 1;
    refcount.assign(pages, 0);
    free_pages.reserve(pages);
    for (int32_t p = pages - 1; p >= 1; --p) free_pages.push_back(p);
    // pop_back() yields low page ids first, matching the Python allocator
    // (free list built descending, popped from the back)
  }

  int32_t alloc_page() {
    int32_t p = free_pages.back();
    free_pages.pop_back();
    refcount[p] = 1;
    return p;
  }

  void release(int32_t p) {
    if (--refcount[p] <= 0) {
      refcount[p] = 0;
      free_pages.push_back(p);
    }
  }

  int32_t pages_needed(int32_t tokens) const {
    return (tokens + page_size - 1) / page_size;
  }
};

}  // namespace

extern "C" {

void* bm_new(int32_t num_pages, int32_t page_size, double watermark) {
  return new BlockManager(num_pages, page_size, watermark);
}

void bm_delete(void* h) { delete static_cast<BlockManager*>(h); }

int32_t bm_num_free(void* h) {
  return static_cast<int32_t>(static_cast<BlockManager*>(h)->free_pages.size());
}

// 0 = OK, 1 = LATER, 2 = IMPOSSIBLE
int32_t bm_can_allocate(void* h, int64_t seq, int32_t num_tokens) {
  auto* bm = static_cast<BlockManager*>(h);
  int32_t total = bm->pages_needed(num_tokens);
  if (total > bm->num_pages - 1) return 2;
  int32_t have = 0;
  auto it = bm->seqs.find(seq);
  if (it != bm->seqs.end()) have = static_cast<int32_t>(it->second.table.size());
  int32_t need = total - have;
  if (static_cast<int32_t>(bm->free_pages.size()) - need >= bm->watermark_pages)
    return 0;
  return 1;
}

// extend seq's table to cover num_tokens; returns new table length or -1
int32_t bm_allocate(void* h, int64_t seq, int32_t num_tokens) {
  auto* bm = static_cast<BlockManager*>(h);
  auto& st = bm->seqs[seq];
  int32_t need = bm->pages_needed(num_tokens) -
                 static_cast<int32_t>(st.table.size());
  if (need > static_cast<int32_t>(bm->free_pages.size())) return -1;
  for (int32_t i = 0; i < need; ++i) st.table.push_back(bm->alloc_page());
  return static_cast<int32_t>(st.table.size());
}

int32_t bm_can_append(void* h, int64_t seq, int32_t kv_len, int32_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  int32_t have = 0;
  auto it = bm->seqs.find(seq);
  if (it != bm->seqs.end()) have = static_cast<int32_t>(it->second.table.size());
  int32_t need = bm->pages_needed(kv_len + n) - have;
  if (need < 0) need = 0;
  return static_cast<int32_t>(bm->free_pages.size()) >= need ? 1 : 0;
}

// Ensure capacity for [kv_len, kv_len+n); returns packed COW (src<<32)|dst,
// -1 for none, -2 on out-of-pages.
int64_t bm_append_slots(void* h, int64_t seq, int32_t kv_len, int32_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  auto& st = bm->seqs[seq];
  int64_t cow = -1;
  int32_t first_idx = kv_len / bm->page_size;
  if (kv_len % bm->page_size != 0 &&
      first_idx < static_cast<int32_t>(st.table.size())) {
    int32_t page = st.table[first_idx];
    if (bm->refcount[page] > 1) {
      if (bm->free_pages.empty()) return -2;
      int32_t np = bm->alloc_page();
      bm->refcount[page] -= 1;
      st.table[first_idx] = np;
      cow = (static_cast<int64_t>(page) << 32) |
            static_cast<uint32_t>(np);
    }
  }
  int32_t end_pages = bm->pages_needed(kv_len + n);
  while (static_cast<int32_t>(st.table.size()) < end_pages) {
    if (bm->free_pages.empty()) return -2;
    st.table.push_back(bm->alloc_page());
  }
  return cow;
}

void bm_free_seq(void* h, int64_t seq) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq);
  if (it == bm->seqs.end()) return;
  auto& st = it->second;
  for (size_t i = st.released; i < st.table.size(); ++i)
    bm->release(st.table[i]);
  bm->seqs.erase(it);
}

// Early-release whole pages strictly behind a sliding window: frees
// table[released, n) while keeping the entries as positional placeholders
// (the paged equivalent of the reference's sliding-window KV truncation,
// cache_manager.rs:101-154).
void bm_release_prefix(void* h, int64_t seq, int32_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq);
  if (it == bm->seqs.end()) return;
  auto& st = it->second;
  if (n > static_cast<int32_t>(st.table.size()))
    n = static_cast<int32_t>(st.table.size());
  for (int32_t i = st.released; i < n; ++i) bm->release(st.table[i]);
  if (n > st.released) st.released = n;
}

int32_t bm_table_len(void* h, int64_t seq) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq);
  return it == bm->seqs.end() ? 0
                              : static_cast<int32_t>(it->second.table.size());
}

void bm_get_table(void* h, int64_t seq, int32_t* out) {
  auto* bm = static_cast<BlockManager*>(h);
  auto it = bm->seqs.find(seq);
  if (it == bm->seqs.end()) return;
  std::memcpy(out, it->second.table.data(),
              it->second.table.size() * sizeof(int32_t));
}

void bm_share_prefix(void* h, int64_t seq, const int32_t* pages, int32_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  auto& st = bm->seqs[seq];
  st.table.assign(pages, pages + n);
  for (int32_t i = 0; i < n; ++i) bm->refcount[pages[i]] += 1;
}

// share_prefix for a fork whose parent window-released its first `released`
// pages: those entries are positional placeholders and must NOT be
// referenced (their pages may already be back in the free list).
void bm_share_prefix_released(void* h, int64_t seq, const int32_t* pages,
                              int32_t n, int32_t released) {
  auto* bm = static_cast<BlockManager*>(h);
  auto& st = bm->seqs[seq];
  st.table.assign(pages, pages + n);
  if (released > n) released = n;
  st.released = released;
  for (int32_t i = released; i < n; ++i) bm->refcount[pages[i]] += 1;
}

void bm_ref_pages(void* h, const int32_t* pages, int32_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  for (int32_t i = 0; i < n; ++i) bm->refcount[pages[i]] += 1;
}

void bm_unref_pages(void* h, const int32_t* pages, int32_t n) {
  auto* bm = static_cast<BlockManager*>(h);
  for (int32_t i = 0; i < n; ++i) bm->release(pages[i]);
}

int32_t bm_refcount(void* h, int32_t page) {
  return static_cast<BlockManager*>(h)->refcount[page];
}

}  // extern "C"
