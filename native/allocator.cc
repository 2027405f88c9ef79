// KV block allocator + radix prefix cache (C API for ctypes).
//
// The TPU-native analog of vLLM's C++ block manager (the reference system
// only reaches it through the --block-size flag of the engine image it
// deploys; see repo SURVEY.md §2.9). Exposed as a C ABI so the Python
// engine binds via ctypes — no pybind11 dependency.
//
// Design:
// - Ref-counted page pool; block 0 reserved as the null block.
// - Free blocks kept in a LIFO free list for cache-friendly reuse.
// - Radix (token-trie) prefix cache: completed-prefix block chains are
//   registered with their token content; a later request can claim the
//   longest matching prefix, sharing blocks ref-counted copy-on-write
//   style. Unreferenced cached blocks are evicted LRU when the pool runs
//   dry.
//
// Build: g++ -O2 -shared -fPIC -o libvbpt_alloc.so allocator.cc

#include <cstdint>
#include <cstring>
#include <list>
#include <map>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

struct RadixNode {
  // key: one block's worth of token ids (fixed block_size chunk)
  std::map<std::vector<int32_t>, std::unique_ptr<RadixNode>> children;
  RadixNode* parent = nullptr;
  int32_t block = -1;           // physical block holding this chunk's KV
  uint64_t last_use = 0;        // LRU stamp
  std::vector<int32_t> edge;    // chunk content (key in parent)
};

struct Allocator {
  int32_t num_blocks;
  int32_t block_size;           // tokens per block (for the prefix cache)
  std::vector<int32_t> refcount;     // per block
  std::vector<int32_t> free_list;    // LIFO
  // prefix cache
  RadixNode root;
  std::unordered_map<int32_t, RadixNode*> block_to_node;
  uint64_t tick = 0;
  int64_t cache_hits = 0;
  int64_t cache_queries = 0;
  int64_t evictions = 0;
};

// Pop a free block; if none, try to evict an unreferenced cached block.
int32_t pop_free(Allocator* a);

void detach_node(Allocator* a, RadixNode* node) {
  // remove a leaf node from the trie (must have no children)
  a->block_to_node.erase(node->block);
  RadixNode* parent = node->parent;
  parent->children.erase(node->edge);
}

bool evict_one(Allocator* a) {
  // find the LRU cached leaf block with refcount 0
  RadixNode* victim = nullptr;
  uint64_t best = UINT64_MAX;
  for (auto& [block, node] : a->block_to_node) {
    if (a->refcount[block] == 0 && node->children.empty() &&
        node->last_use < best) {
      best = node->last_use;
      victim = node;
    }
  }
  if (victim == nullptr) return false;
  int32_t block = victim->block;
  detach_node(a, victim);
  a->free_list.push_back(block);
  a->evictions++;
  return true;
}

int32_t pop_free(Allocator* a) {
  if (a->free_list.empty() && !evict_one(a)) return -1;
  int32_t b = a->free_list.back();
  a->free_list.pop_back();
  return b;
}

}  // namespace

extern "C" {

void* vbpt_alloc_create(int32_t num_blocks, int32_t block_size) {
  if (num_blocks < 2) return nullptr;
  auto* a = new Allocator();
  a->num_blocks = num_blocks;
  a->block_size = block_size;
  a->refcount.assign(num_blocks, 0);
  a->free_list.reserve(num_blocks - 1);
  for (int32_t b = num_blocks - 1; b >= 1; --b) a->free_list.push_back(b);
  return a;
}

void vbpt_alloc_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t vbpt_alloc_num_free(void* h) {
  auto* a = static_cast<Allocator*>(h);
  // evictable cached blocks count as free capacity
  int32_t evictable = 0;
  for (auto& [block, node] : a->block_to_node)
    if (a->refcount[block] == 0) evictable++;
  return static_cast<int32_t>(a->free_list.size()) + evictable;
}

// Allocate n blocks; writes ids into out. Returns 0 on success, -1 if
// the pool (incl. evictions) can't satisfy the request (no partial
// allocation).
int32_t vbpt_alloc_allocate(void* h, int32_t n, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  if (vbpt_alloc_num_free(h) < n) return -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = pop_free(a);
    if (b < 0) {  // shouldn't happen after the capacity check
      for (int32_t j = 0; j < i; ++j) a->free_list.push_back(out[j]);
      return -1;
    }
    a->refcount[b] = 1;
    out[i] = b;
  }
  return 0;
}

// Drop one reference per block; blocks whose refcount hits 0 return to
// the free list unless they are registered in the prefix cache (those
// stay resident, evictable-on-demand).
int32_t vbpt_alloc_free(void* h, const int32_t* blocks, int32_t n) {
  auto* a = static_cast<Allocator*>(h);
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = blocks[i];
    if (b <= 0 || b >= a->num_blocks || a->refcount[b] <= 0) return -1;
    if (--a->refcount[b] == 0 && !a->block_to_node.count(b))
      a->free_list.push_back(b);
  }
  return 0;
}

int32_t vbpt_alloc_fork(void* h, const int32_t* blocks, int32_t n) {
  auto* a = static_cast<Allocator*>(h);
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = blocks[i];
    if (b <= 0 || b >= a->num_blocks) return -1;
    a->refcount[b]++;
  }
  return 0;
}

int32_t vbpt_alloc_ref_count(void* h, int32_t block) {
  auto* a = static_cast<Allocator*>(h);
  if (block < 0 || block >= a->num_blocks) return -1;
  return a->refcount[block];
}

// ---- prefix cache ---------------------------------------------------------

// Register a sequence's full-block prefix chain: tokens has
// n_blocks*block_size ids; blocks has n_blocks physical ids (caller keeps
// its references; the cache holds none but keeps blocks resident when the
// caller frees them).
int32_t vbpt_prefix_insert(void* h, const int32_t* tokens,
                           const int32_t* blocks, int32_t n_blocks) {
  auto* a = static_cast<Allocator*>(h);
  RadixNode* node = &a->root;
  a->tick++;
  for (int32_t i = 0; i < n_blocks; ++i) {
    std::vector<int32_t> chunk(tokens + i * a->block_size,
                               tokens + (i + 1) * a->block_size);
    auto it = node->children.find(chunk);
    if (it != node->children.end()) {
      node = it->second.get();
      node->last_use = a->tick;
      continue;  // already cached (possibly under a different block: keep)
    }
    auto child = std::make_unique<RadixNode>();
    child->parent = node;
    child->block = blocks[i];
    child->edge = chunk;
    child->last_use = a->tick;
    RadixNode* raw = child.get();
    node->children.emplace(std::move(chunk), std::move(child));
    a->block_to_node.emplace(blocks[i], raw);
    node = raw;
  }
  return 0;
}

// Longest cached prefix for tokens[0 .. n_tokens); writes matched block
// ids (ref-counted for the caller) into out. Returns #blocks matched.
int32_t vbpt_prefix_match(void* h, const int32_t* tokens, int32_t n_tokens,
                          int32_t* out, int32_t max_out) {
  auto* a = static_cast<Allocator*>(h);
  a->cache_queries++;
  RadixNode* node = &a->root;
  int32_t matched = 0;
  a->tick++;
  int32_t full_blocks = n_tokens / a->block_size;
  while (matched < full_blocks && matched < max_out) {
    std::vector<int32_t> chunk(tokens + matched * a->block_size,
                               tokens + (matched + 1) * a->block_size);
    auto it = node->children.find(chunk);
    if (it == node->children.end()) break;
    node = it->second.get();
    node->last_use = a->tick;
    out[matched] = node->block;
    a->refcount[node->block]++;
    matched++;
  }
  if (matched > 0) a->cache_hits++;
  return matched;
}

void vbpt_alloc_stats(void* h, int64_t* out4) {
  auto* a = static_cast<Allocator*>(h);
  out4[0] = a->cache_queries;
  out4[1] = a->cache_hits;
  out4[2] = a->evictions;
  out4[3] = static_cast<int64_t>(a->block_to_node.size());
}

}  // extern "C"
