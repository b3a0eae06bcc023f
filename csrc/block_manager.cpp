// Native engine runtime: paged KV block allocator with hash-chained prefix
// cache. C++ twin of nanovllm_tpu/engine/block_manager.py — the per-step
// host hot path (allocate / append / deallocate bookkeeping) runs here
// without Python object overhead; semantics are bit-identical and enforced
// by tests/test_native_runtime.py.
//
// The reference delegates its native layer to vendor kernels
// (SURVEY.md §2a); this is the first-party native runtime piece of the TPU
// build. Exposed as a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <unordered_set>
#include <vector>

// ---------------------------------------------------------------------------
// XXH64 (spec-conformant, seed 0) — matches python-xxhash's xxh64.
// ---------------------------------------------------------------------------
namespace xxh {

static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl(uint64_t x, int r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

static inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

static inline uint64_t round1(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl(acc, 31);
  return acc * P1;
}

static inline uint64_t merge(uint64_t acc, uint64_t val) {
  acc ^= round1(0, val);
  return acc * P1 + P4;
}

uint64_t xxh64(const uint8_t* p, size_t len, uint64_t seed) {
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      v1 = round1(v1, read64(p)); p += 8;
      v2 = round1(v2, read64(p)); p += 8;
      v3 = round1(v3, read64(p)); p += 8;
      v4 = round1(v4, read64(p)); p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = merge(h, v1); h = merge(h, v2); h = merge(h, v3); h = merge(h, v4);
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (p + 8 <= end) {
    h ^= round1(0, read64(p));
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    ++p;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

}  // namespace xxh

// ---------------------------------------------------------------------------
// Block manager
// ---------------------------------------------------------------------------

static const int64_t NO_HASH = -1;

struct BlockManager {
  int num_blocks;
  int block_size;
  std::vector<int> ref;
  std::vector<int64_t> hash;                 // -1 = none; else (int64)xxh64
  std::vector<std::vector<int64_t>> tokens;  // content key per block
  std::deque<int> free_list;
  std::unordered_map<int64_t, int> hash_to_block;
  std::unordered_set<int64_t> non_cacheable;
};

static int64_t hash_block(const int64_t* toks, int n, int64_t prefix) {
  // Mirrors python hash_block: optional little-endian 8-byte prefix digest,
  // then the int64 token array bytes.
  std::vector<uint8_t> buf;
  buf.reserve((n + 1) * 8);
  if (prefix != NO_HASH) {
    uint64_t u = (uint64_t)prefix;
    for (int i = 0; i < 8; i++) buf.push_back((u >> (8 * i)) & 0xff);
  }
  const uint8_t* tb = reinterpret_cast<const uint8_t*>(toks);
  buf.insert(buf.end(), tb, tb + (size_t)n * 8);
  return (int64_t)xxh::xxh64(buf.data(), buf.size(), 0);
}

static int take_free(BlockManager* bm) {
  int bid = bm->free_list.front();
  bm->free_list.pop_front();
  bm->ref[bid] = 1;
  bm->hash[bid] = NO_HASH;
  bm->tokens[bid].clear();
  return bid;
}

static void take_specific(BlockManager* bm, int bid) {
  for (auto it = bm->free_list.begin(); it != bm->free_list.end(); ++it) {
    if (*it == bid) {
      bm->free_list.erase(it);
      break;
    }
  }
  bm->ref[bid] = 1;
}

static void release(BlockManager* bm, int bid) {
  if (--bm->ref[bid] == 0) bm->free_list.push_back(bid);
}

static void publish(BlockManager* bm, int bid, int64_t h,
                    const int64_t* toks, int n) {
  bm->hash[bid] = h;
  bm->tokens[bid].assign(toks, toks + n);
  bm->hash_to_block[h] = bid;
}

extern "C" {

void* bm_create(int num_blocks, int block_size,
                const int64_t* non_cacheable, int n_nc) {
  auto* bm = new BlockManager();
  bm->num_blocks = num_blocks;
  bm->block_size = block_size;
  bm->ref.assign(num_blocks, 0);
  bm->hash.assign(num_blocks, NO_HASH);
  bm->tokens.resize(num_blocks);
  for (int i = 0; i < num_blocks; i++) bm->free_list.push_back(i);
  for (int i = 0; i < n_nc; i++) bm->non_cacheable.insert(non_cacheable[i]);
  return bm;
}

void bm_destroy(void* h) { delete static_cast<BlockManager*>(h); }

int bm_num_free(void* h) {
  return (int)static_cast<BlockManager*>(h)->free_list.size();
}

int bm_ref_count(void* h, int bid) {
  return static_cast<BlockManager*>(h)->ref[bid];
}

int64_t bm_block_hash(void* h, int bid) {
  return static_cast<BlockManager*>(h)->hash[bid];
}

int bm_can_allocate(void* h, int seq_len) {
  auto* bm = static_cast<BlockManager*>(h);
  int need = (seq_len + bm->block_size - 1) / bm->block_size;
  return (int)bm->free_list.size() >= need;
}

// Builds the block table for a fresh sequence. Returns num_cached_tokens,
// -1 on OOM, or -2 when the table would exceed `table_cap` entries (state
// may be partially mutated on failure, so callers must check
// bm_can_allocate and size their buffers first, like the python side).
int bm_allocate(void* h, const int64_t* toks, int n,
                int32_t* table_out, int* table_len_out, int table_cap) {
  auto* bm = static_cast<BlockManager*>(h);
  int bs = bm->block_size;
  int nblocks = (n + bs - 1) / bs;
  if (nblocks > table_cap) return -2;
  int64_t chain = NO_HASH;
  bool chain_alive = true;
  // Hashes are only meaningful while the chain from the sequence start is
  // unbroken; after a non-cacheable block resets it, a downstream hash with
  // a NO_HASH prefix would be ambiguous with a sequence-initial block.
  bool chain_intact = true;
  int cached = 0;
  for (int i = 0; i < nblocks; i++) {
    const int64_t* bt = toks + (int64_t)i * bs;
    int blen = (i == nblocks - 1) ? n - i * bs : bs;
    bool full = blen == bs;
    bool cacheable = full;
    if (cacheable && !bm->non_cacheable.empty()) {
      for (int j = 0; j < blen; j++) {
        if (bm->non_cacheable.count(bt[j])) { cacheable = false; break; }
      }
    }
    if (cacheable && chain_intact) {
      chain = hash_block(bt, blen, chain);
    } else {
      chain = NO_HASH;
      chain_intact = false;
    }
    int hit = -1;
    if (chain_alive && cacheable) {
      auto it = bm->hash_to_block.find(chain);
      if (it != bm->hash_to_block.end()) {
        int cand = it->second;
        const auto& cont = bm->tokens[cand];
        if ((int)cont.size() == blen &&
            std::memcmp(cont.data(), bt, (size_t)blen * 8) == 0) {
          hit = cand;
        }
      }
    }
    if (hit >= 0) {
      if (bm->ref[hit] > 0) bm->ref[hit]++;
      else take_specific(bm, hit);
      cached += bs;
      table_out[i] = hit;
    } else {
      chain_alive = false;
      if (bm->free_list.empty()) return -1;
      int bid = take_free(bm);
      if (chain != NO_HASH) publish(bm, bid, chain, bt, blen);
      table_out[i] = bid;
    }
  }
  *table_len_out = nblocks;
  if (cached >= n) cached = n - 1;  // keep one query token
  return cached;
}

void bm_deallocate(void* h, const int32_t* table, int m) {
  auto* bm = static_cast<BlockManager*>(h);
  for (int i = m - 1; i >= 0; i--) release(bm, table[i]);
}

int bm_can_append(void* h, int seq_len) {
  auto* bm = static_cast<BlockManager*>(h);
  int needs = (seq_len % bm->block_size) == 1 ? 1 : 0;
  return (int)bm->free_list.size() >= needs;
}

// Decode-slot reservation; may extend the table (returns new table length,
// or -2 when the extension would exceed `table_cap`) and seals the trailing
// block when it fills.
int bm_append_slot(void* h, const int64_t* toks, int n,
                   int32_t* table, int table_len, int table_cap) {
  auto* bm = static_cast<BlockManager*>(h);
  int bs = bm->block_size;
  int off = n % bs;
  if (off == 1) {
    if (table_len >= table_cap) return -2;
    table[table_len] = take_free(bm);
    return table_len + 1;
  }
  if (off == 0) {
    int last = n / bs - 1;
    const int64_t* bt = toks + (int64_t)last * bs;
    if (!bm->non_cacheable.empty()) {
      for (int j = 0; j < bs; j++)
        if (bm->non_cacheable.count(bt[j])) return table_len;
    }
    int bid = table[last];
    if (bm->hash[bid] != NO_HASH) return table_len;
    int64_t prev = last > 0 ? bm->hash[table[last - 1]] : NO_HASH;
    // Chain broken upstream: a prefix-less hash would be position-ambiguous
    // with a sequence-initial block, so never publish it.
    if (last > 0 && prev == NO_HASH) return table_len;
    publish(bm, bid, hash_block(bt, bs, prev), bt, bs);
  }
  return table_len;
}

}  // extern "C"
